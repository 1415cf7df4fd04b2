import pytest

from deepcoro_clip_tpu.registry import (
    BaseRegistry,
    ConfigRegistry,
    LossRegistry,
    RegistryError,
    register_all,
)


class _RegA(BaseRegistry):
    pass


class _RegB(BaseRegistry):
    pass


def test_registries_are_isolated():
    @_RegA.register("x")
    class X:
        pass

    assert _RegA.get("x") is X
    with pytest.raises(RegistryError):
        _RegB.get("x")


def test_multi_name_and_create():
    @_RegA.register("one", "two")
    class Y:
        def __init__(self, v=3):
            self.v = v

    assert _RegA.get("one") is _RegA.get("two")
    assert _RegA.create("one", v=7).v == 7


def test_loss_registry_case_insensitive():
    @LossRegistry.register("InfoNCE_Loss")
    class L:
        pass

    assert LossRegistry.get("INFONCE_LOSS") is L
    assert LossRegistry.get("infonce_loss") is L


def test_register_all_populates_pipelines():
    register_all()
    assert ConfigRegistry.contains("DeepCORO_clip")
    assert ConfigRegistry.contains("DeepCORO_video_linear_probing")
