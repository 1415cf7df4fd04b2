"""Train a WordPiece vocabulary from a report corpus (VERDICT round-2 #2).

The reference ships the PubMedBERT tokenizer (reference:
models/text_encoder.py:8-23); this environment is zero-egress, so quality
runs previously fell back to the hash tokenizer. This trainer builds a real
``vocab.txt`` from the corpus itself so every downstream artifact
(captioning BLEU/ROUGE, retrieval, stenosis extraction round-trips) runs on
reversible, real text.

Algorithm: likelihood-scored pair merges (the WordPiece objective,
score = count(ab) / (count(a) * count(b))), over the same pre-tokenization
the runtime tokenizer uses (`data/tokenizer.py` splitter), with continuation
pieces prefixed ``##``.

Output layout matches BERT uncased id conventions so the runtime
`WordPieceTokenizer` and the `HashTokenizer` agree on special ids:
[PAD]=0, [UNK]=100, [CLS]=101, [SEP]=102, [MASK]=103, ids 1..99 and
104..998 are [unusedN]. The file is padded with [unusedN] rows to exactly
``--vocab-size`` lines (default 30522) so the text-tower embedding-table
shape — and therefore every warm XLA compile cache — is unchanged.

Usage:
  python scripts/train_wordpiece.py --csv .synth_corpus/data.csv \
      --column Report --out assets/vocab.txt
"""

from __future__ import annotations

import argparse
import collections
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

_SPLITTER = re.compile(r"[a-z]+|\d+|[^\sa-z\d]")  # keep in sync with data/tokenizer.py


def word_counts(texts) -> collections.Counter:
    counts: collections.Counter = collections.Counter()
    for text in texts:
        counts.update(_SPLITTER.findall(str(text).lower()))
    return counts


def train_wordpiece(counts: collections.Counter, n_merges: int,
                    min_freq: int = 2) -> list[str]:
    """Return learned subword tokens (alphabet first, then merges in order)."""
    # each word as a tuple of symbols: first char bare, rest ##-prefixed
    words = {
        tuple([w[0]] + ["##" + c for c in w[1:]]): n
        for w, n in counts.items()
    }
    alphabet: dict[str, int] = collections.Counter()
    for sym, n in words.items():
        for s in sym:
            alphabet[s] += n
    vocab = sorted(alphabet)  # full seen alphabet => [UNK] only on novel chars
    merged: list[str] = []
    for _ in range(n_merges):
        pair_counts: collections.Counter = collections.Counter()
        sym_counts: collections.Counter = collections.Counter()
        for sym, n in words.items():
            for s in sym:
                sym_counts[s] += n
            for a, b in zip(sym, sym[1:]):
                pair_counts[(a, b)] += n
        best, best_score, best_n = None, 0.0, 0
        for (a, b), n in pair_counts.items():
            if n < min_freq:
                continue
            score = n / (sym_counts[a] * sym_counts[b])
            if score > best_score or (score == best_score and n > best_n):
                best, best_score, best_n = (a, b), score, n
        if best is None:
            break
        a, b = best
        new_sym = a + b[2:] if b.startswith("##") else a + b
        merged.append(new_sym)
        new_words = {}
        for sym, n in words.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(new_sym)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + n
        words = new_words
    return vocab + merged


def emit_bert_layout(tokens: list[str], vocab_size: int) -> list[str]:
    """BERT-uncased id layout, padded to exactly ``vocab_size`` lines."""
    lines = ["[PAD]"]
    lines += [f"[unused{i}]" for i in range(99)]        # ids 1..99
    lines += ["[UNK]", "[CLS]", "[SEP]", "[MASK]"]      # ids 100..103
    lines += [f"[unused{i}]" for i in range(99, 994)]   # ids 104..998
    seen = set(lines)
    # guaranteed single-char alphabet (like real BERT vocabs) so novel
    # words/numbers always wordpiece-decompose instead of hitting [UNK]
    base = "abcdefghijklmnopqrstuvwxyz0123456789" + ".,;:%()/-+<>="
    alphabet = [c for c in base] + ["##" + c for c in base]
    for t in alphabet + tokens:
        if t not in seen:
            lines.append(t)
            seen.add(t)
    if len(lines) > vocab_size:
        raise SystemExit(
            f"learned {len(lines)} tokens > vocab_size {vocab_size}; "
            "lower --merges or raise --vocab-size")
    lines += [f"[unused{i}]" for i in range(994, 994 + vocab_size - len(lines))]
    return lines


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--csv", action="append", default=[],
                    help="corpus CSV (alpha-separated, see data/csv_utils.py)")
    ap.add_argument("--column", default="Report")
    ap.add_argument("--text", action="append", default=[],
                    help="plain text file, one document per line")
    ap.add_argument("--out", default=str(REPO / "assets" / "vocab.txt"))
    ap.add_argument("--vocab-size", type=int, default=30522)
    ap.add_argument("--merges", type=int, default=4000)
    ap.add_argument("--min-freq", type=int, default=2)
    args = ap.parse_args(argv)

    texts: list[str] = []
    for path in args.csv:
        from deepcoro_clip_tpu.data.csv_utils import read_csv_with_fallback

        df = read_csv_with_fallback(path)
        texts.extend(df[args.column].dropna().astype(str).tolist())
    for path in args.text:
        texts.extend(Path(path).read_text().splitlines())
    if not texts:
        raise SystemExit("no input texts (--csv/--text)")

    counts = word_counts(texts)
    tokens = train_wordpiece(counts, args.merges, args.min_freq)
    lines = emit_bert_layout(tokens, args.vocab_size)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text("\n".join(lines) + "\n")

    # report coverage with the runtime tokenizer itself
    from deepcoro_clip_tpu.data.tokenizer import WordPieceTokenizer

    tok = WordPieceTokenizer(str(out))
    n_unk = sum(tok.tokenize_ids(t).count(tok.unk_id) for t in texts[:2000])
    n_tok = sum(len(tok.tokenize_ids(t)) for t in texts[:2000])
    print(f"corpus: {len(texts)} docs, {sum(counts.values())} words, "
          f"{len(counts)} unique")
    print(f"vocab: {len(lines)} lines ({len(tokens)} learned) -> {out}")
    print(f"UNK rate on first 2000 docs: {n_unk}/{n_tok} "
          f"({100.0 * n_unk / max(1, n_tok):.3f}%)")


if __name__ == "__main__":
    main()
