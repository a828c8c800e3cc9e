"""Method registry + factories.

Equivalent of the reference's config-driven dispatch layer (reference
src/config.py:9-11,67-149: ``method_dict`` + get_model/get_trainer/
get_dataset).  The registry keeps the framework extensible to new methods /
dataset types the way the reference's ``method_dict`` did, without the dead
NeRF-era branches (SURVEY.md §1).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

_MODEL_BUILDERS: Dict[str, Callable] = {}
_DATASET_BUILDERS: Dict[str, Callable] = {}
_TRAINER_BUILDERS: Dict[str, Callable] = {}


def register_method(name: str, *, model: Callable = None,
                    trainer: Callable = None):
    if model:
        _MODEL_BUILDERS[name] = model
    if trainer:
        _TRAINER_BUILDERS[name] = trainer


def register_dataset(name: str, builder: Callable):
    _DATASET_BUILDERS[name] = builder


def get_model(cfg: Dict[str, Any], **kw):
    """Build the method's model params (reference src/config.py:67-78)."""
    return _MODEL_BUILDERS[cfg["method"]](cfg, **kw)


def get_trainer(cfg: Dict[str, Any], **kw):
    return _TRAINER_BUILDERS[cfg["method"]](cfg, **kw)


def get_dataset(mode: str, cfg: Dict[str, Any], **kw):
    """Build a dataset by cfg['data']['dataset'] type
    (reference src/config.py:112-149)."""
    return _DATASET_BUILDERS[cfg["data"]["dataset"]](
        cfg["data"]["path"], mode, cfg, **kw)


# ---------------------------------------------------------------------------
# built-in registrations
# ---------------------------------------------------------------------------

def _build_face_simple_model(cfg, **kw):
    import jax
    from speech2lip_tpu.models import talking_face, unet_light
    seed = cfg["training"].get("seed", 0)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    params = talking_face.init(k1, cfg, **kw)
    unet_p, unet_s = unet_light.init(k2)
    return params, unet_p, unet_s


def _build_face_simple_trainer(cfg, **kw):
    from speech2lip_tpu.train import trainer
    return trainer


def _build_lip_dataset(path, mode, cfg, **kw):
    from speech2lip_tpu.data.dataset import LipDataset
    return LipDataset(path, mode, cfg)


register_method("face_simple", model=_build_face_simple_model,
                trainer=_build_face_simple_trainer)
register_dataset("lip_someone", _build_lip_dataset)
