from fabric_tpu.infer.tiling import (  # noqa: F401
    extract_tiles, stitch_tiles, extract_tiles_overlap, stitch_average,
)
from fabric_tpu.infer.runner import predict_scene, infer_city  # noqa: F401
