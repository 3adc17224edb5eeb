"""nfs_tpu — a TPU-native neural style transfer framework for fluids.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``byungsook/neural-flow-style`` (TNST, SIGGRAPH Asia 2019, arXiv:1905.07442;
LNST, SIGGRAPH 2020, arXiv:2005.00803): stylization of smoke density grids
and liquid/smoke particle sets against a style image (VGG-19 Gram losses) or
a semantic CNN-channel target, via multi-scale octave Adam optimization of
density perturbations, stylization velocity fields, or per-particle
attributes, rendered through a differentiable Beer-Lambert volume renderer
over Poisson-disk-sampled camera views, with temporal coherence from
semi-Lagrangian transport.

Layer map (mirrors SURVEY.md §1, reference layout per SURVEY.md §2):

- :mod:`nfs_tpu.core`     — typed configs, pytree containers, PRNG plumbing
                            (reference: ``config.py``)
- :mod:`nfs_tpu.io`       — ``.npz`` frame store, mantaflow ``.uni`` codec,
                            image/video export (reference: ``util.py``)
- :mod:`nfs_tpu.ops`      — differentiable field ops: interpolation,
                            semi-Lagrangian advection, rotation resampling,
                            octave resizing, particle splatting
                            (reference: ``transform.py``)
- :mod:`nfs_tpu.render`   — Beer-Lambert ray-marcher + Poisson-disk camera
                            sampling (reference: in-styler renderer)
- :mod:`nfs_tpu.features` — VGG-19 feature network, Gram/semantic/content
                            losses (reference: frozen-graph CNN plumbing)
- :mod:`nfs_tpu.styler`   — TNST grid engine and LNST particle engine with
                            the octave/Adam driver (reference: ``styler.py``
                            / ``styler_p.py``)
- :mod:`nfs_tpu.parallel` — device meshes, frame/view sharding, ppermute
                            halo exchange (no reference equivalent: the
                            reference is single-GPU)
- :mod:`nfs_tpu.sim`      — self-contained JAX smoke / FLIP-style solvers
                            replacing the external mantaflow dependency
                            (reference: ``scene/*.py`` + mantaflow C++)
- :mod:`nfs_tpu.cli`      — stylization entrypoint mirroring the reference's
                            public flag surface
"""

__version__ = "0.1.0"

from nfs_tpu.core.config import (  # noqa: E402
    StyleConfig, DataConfig, RenderConfig, LossConfig, OptimConfig,
    ParticleConfig, ParallelConfig, replace as config_replace,
)


def __getattr__(name):
    """Lazy top-level API (avoids importing jax at package import)."""
    lazy = {
        "GridStyler": ("nfs_tpu.styler.grid", "GridStyler"),
        "ParticleStyler": ("nfs_tpu.styler.particle", "ParticleStyler"),
        "ParallelSequenceStyler": ("nfs_tpu.parallel.engine",
                                   "ParallelSequenceStyler"),
        "ParticleSet": ("nfs_tpu.core.pytrees", "ParticleSet"),
    }
    if name in lazy:
        import importlib

        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'nfs_tpu' has no attribute {name!r}")
