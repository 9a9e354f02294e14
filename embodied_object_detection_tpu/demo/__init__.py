"""Demo / serving surface. Imports are lazy: pulling in predictor eagerly
would pay the full jax + model-stack import cost before a CLI's argparse
even runs (demo.py defers these imports into functions for that reason)."""

_LAZY = {"EmbodiedPredictor", "AsyncPredictor", "get_clip_embeddings",
         "build_zs_weight", "load_zs_weight_npy"}

__all__ = sorted(_LAZY)


def __getattr__(name):
    if name in _LAZY:
        from . import predictor
        return getattr(predictor, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
