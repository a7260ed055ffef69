"""Model zoo: SRGNN, NISER, LESSR, MSGIFSR (reference: src/models/__init__.py)."""

from sessionrec_tpu.models.srgnn import SRGNN  # noqa: F401
from sessionrec_tpu.models.niser import NISER  # noqa: F401
from sessionrec_tpu.models.lessr import LESSR  # noqa: F401
from sessionrec_tpu.models.msgifsr import MSGIFSR  # noqa: F401

_REGISTRY = {"srgnn": SRGNN, "niser": NISER, "lessr": LESSR, "msgifsr": MSGIFSR}


def build_model(cfg, num_items: int):
    """Instantiate a model from a ModelConfig + catalog size."""
    name = cfg.name.lower()
    if name not in _REGISTRY:
        raise ValueError(f"unknown model {cfg.name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name].from_config(cfg, num_items)
