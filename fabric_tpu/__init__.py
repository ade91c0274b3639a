"""fabric-tpu: a TPU-native (JAX/XLA/Pallas/pjit) change-detection framework.

A brand-new framework with the capabilities of granularai/fabric (bi-date
Sentinel-2 change detection), designed TPU-first:

- NHWC Flax models (Siamese U-Net, UNetLSTM, 3D U-Net) with shared-weight
  encoders and multiplicative-ReLU fusion.
- jit-compiled train/eval steps, optax optimizers, checkpoint *and resume*.
- ``jax.sharding.Mesh`` based data/spatial/model parallelism over ICI.
- Pallas TPU kernels for the fused hot paths (gated behind a flag).
- Host-side ingestion pipeline (GeoTIFF/NPY) with device prefetch.
- Whole-scene tiled inference with reference-exact and overlap-averaged
  stitching, sharded across the mesh.

See SURVEY.md for the structural analysis of the reference and the layer map
this package implements.
"""

__version__ = "0.1.0"

from fabric_tpu.config import Config, load_config  # noqa: F401


def run_training(cfg, **kwargs):
    """Run the training driver (see fabric_tpu.train.loop.train).

    Named run_training (not train) because ``fabric_tpu.train`` is the
    subpackage — a same-named function would be clobbered by Python's
    submodule attribute binding on first import of fabric_tpu.train.*.
    """
    from fabric_tpu.train.loop import train as _train
    return _train(cfg, **kwargs)


def scene_predictor(cfg, checkpoint=None, **kwargs):
    """Build a serving ScenePredictor (see fabric_tpu.infer.service)."""
    from fabric_tpu.infer.service import ScenePredictor
    return ScenePredictor(cfg, checkpoint=checkpoint, **kwargs)
