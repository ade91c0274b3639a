"""Model zoo: Siamese bi-date U-Net plus the multi-date variants.

``build_model(cfg)`` is the factory used by the train/infer drivers
(replacing the reference's hardcoded ``BiDateNet(13, 2)`` at
utils/helpers.py:334).
"""

from fabric_tpu.models.blocks import DoubleConv, Down, Up, OutConv  # noqa: F401
from fabric_tpu.models.bidate import BiDateNet  # noqa: F401


def build_model(cfg):
    import jax.numpy as jnp
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    # sync_batchnorm is accepted but adds nothing: the train/eval steps run
    # under jit SPMD, where BN batch statistics are computed over the global
    # (all-device) batch already — bn_axis_name/pmean is only needed under
    # shard_map/pmap, which the drivers don't use.  Setting axis_name here
    # would crash at trace time (no bound axis in jit) — advisor finding r1.
    if getattr(cfg, "sync_batchnorm", False):
        import logging
        logging.getLogger("fabric_tpu").warning(
            "sync_batchnorm=True is a no-op under jit SPMD: BN batch "
            "statistics are already computed over the global batch")
    base = getattr(cfg, "model_base", 0)
    common = dict(n_channels=cfg.n_channels, n_classes=cfg.n_classes,
                  dtype=dtype, bn_axis_name=None,
                  local_upsample=getattr(cfg, "local_upsample", False))
    if cfg.model == "bidate":
        return BiDateNet(base=base or 64,
                         use_pallas=getattr(cfg, "use_pallas", False),
                         lane_pack=getattr(cfg, "lane_pack", False),
                         lane_pack_bwd=getattr(cfg, "lane_pack_bwd", False),
                         remat=getattr(cfg, "remat", False),
                         joint_date_batchnorm=not getattr(
                             cfg, "per_date_batchnorm", False),
                         **common)
    if cfg.model == "unet_lstm":
        from fabric_tpu.models.unet_lstm import UNetLSTM
        return UNetLSTM(base=base or 64,
                        use_pallas=getattr(cfg, "use_pallas", False),
                        **common)
    if cfg.model == "unet3d":
        from fabric_tpu.models.unet3d import UNet3D
        return UNet3D(base=base or 32, **common)
    raise ValueError(f"unknown model: {cfg.model!r}")
