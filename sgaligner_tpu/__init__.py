"""sgaligner_tpu — a TPU-native (JAX/XLA/Pallas/pjit) scene-graph alignment framework.

Re-designed from scratch with the capabilities of sayands/sgaligner (ICCV 2023):
multi-modal 3D scene-graph node alignment on 3RScan/3DSSG subscan pairs, plus the
downstream tasks of point-cloud registration, overlap detection, and mosaicking.

Unlike the reference (single-GPU PyTorch with ragged concat-batching and per-graph
python loops, see /root/reference/src/aligner/sg_aligner.py:86-110), this framework:

* pads variable-size scene pairs to static bucketed shapes (`data/batch.py`),
* runs the object encoder, dense masked GAT, fusion, losses, and alignment metrics
  as a single jitted XLA program per step,
* scales data-parallel over a `jax.sharding.Mesh` (`parallel/`),
* keeps the reference's config surface (same YAML keys), checkpoint semantics
  (epoch/iteration metadata, torch-checkpoint import), and evaluation metrics
  (MRR, Hits@K, SGAR, CD/RRE/RTE/FMR/RR).
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level exports (keep `import sgaligner_tpu` jax-free)."""
    if name in ("MultiModalEncoder", "EVA"):
        import sgaligner_tpu.models.eva as _eva
        import sgaligner_tpu.models.sg_aligner as _sg

        return {"MultiModalEncoder": _sg.MultiModalEncoder,
                "EVA": _eva.EVA}[name]
    if name == "Config":
        from sgaligner_tpu.core.config import Config

        return Config
    if name in ("load_aligner", "Aligner"):
        from sgaligner_tpu import api

        return getattr(api, name)
    if name == "Trainer":
        from sgaligner_tpu.engine.trainer import Trainer

        return Trainer
    if name in ("export_serving_artifact", "load_serving_artifact",
                "ServingArtifact"):
        from sgaligner_tpu import serving

        return getattr(serving, name)
    raise AttributeError(name)
