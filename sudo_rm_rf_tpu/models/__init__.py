"""Model zoo.

Each model is a flax.linen module whose parameter tree mirrors the reference
PyTorch module's ``state_dict()`` naming (dots -> nesting, list indices fused
into the parent name: torch ``sm.0.proj_1x1.conv.weight`` <-> flax path
``('sm_0', 'proj_1x1', 'conv', 'weight')``) so the published ``.pt``
checkpoints convert by pure renaming (see sudo_rm_rf_tpu/convert/).

Registry: `get_model(name, **overrides)` mirrors the reference's
``--model_type`` dispatch (`run_attentive_sudormrf.py:88-150`,
`run_fuss_separation.py:134-172`).
"""

from sudo_rm_rf_tpu.models.improved_sudormrf import SuDORMRFImproved
from sudo_rm_rf_tpu.models.sudormrf import SuDORMRFv1
from sudo_rm_rf_tpu.models.groupcomm_sudormrf import GroupCommSuDORMRF
from sudo_rm_rf_tpu.models.causal_sudormrf import CausalSuDORMRF

_REGISTRY = {}


def register(name):
    def wrap(ctor):
        _REGISTRY[name] = ctor
        return ctor

    return wrap


def get_model(name: str, **kwargs):
    """Build a model by reference-compatible name.

    Names follow the reference CLI: relu (improved), softmax (v1),
    groupcomm_v2, causal, attention{,_v2,_v3}, plus baseline names.
    """
    if name not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kwargs)


register("relu")(SuDORMRFImproved)
register("improved")(SuDORMRFImproved)
register("softmax")(SuDORMRFv1)
register("groupcomm_v2")(GroupCommSuDORMRF)
register("causal")(CausalSuDORMRF)


def _register_lazy(name, modpath, clsname):
    def ctor(**kwargs):
        import importlib

        mod = importlib.import_module(modpath)
        return getattr(mod, clsname)(**kwargs)

    _REGISTRY[name] = ctor


_register_lazy("attention", "sudo_rm_rf_tpu.models.attentive", "AttentiveSuDORMRF")
_register_lazy("attention_v2", "sudo_rm_rf_tpu.models.attentive", "AttentiveSuDORMRFv2")
_register_lazy("attention_v3", "sudo_rm_rf_tpu.models.attentive", "AttentiveSuDORMRFv3")
_register_lazy("convtasnet", "sudo_rm_rf_tpu.models.baselines.convtasnet", "ConvTasNet")
_register_lazy("dprnn", "sudo_rm_rf_tpu.models.baselines.dprnn", "DPRNN")
_register_lazy("demucs", "sudo_rm_rf_tpu.models.baselines.demucs", "Demucs")
_register_lazy("tdcn", "sudo_rm_rf_tpu.models.baselines.tdcn", "TDCN")
_register_lazy("residual_tdcn", "sudo_rm_rf_tpu.models.baselines.tdcn", "ResidualTN")
_register_lazy("sepformer", "sudo_rm_rf_tpu.models.baselines.sepformer", "SepFormer")

__all__ = [
    "SuDORMRFImproved",
    "SuDORMRFv1",
    "GroupCommSuDORMRF",
    "CausalSuDORMRF",
    "get_model",
]
