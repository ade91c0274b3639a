from fabric_tpu.data.oscd import (  # noqa: F401
    list_cities, patch_grid, get_train_val_metadata, metadata_from_dataset,
    load_label, load_city, full_load,
)
from fabric_tpu.data.pipeline import (  # noqa: F401
    PatchSampler, batch_iterator, prefetch_to_device,
)
