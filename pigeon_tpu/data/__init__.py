"""Input pipeline: image ops, caption synthesis, dataset builders."""

from pigeon_tpu.data.image_ops import (  # noqa: F401
    CLIP_IMAGE_MEAN,
    CLIP_IMAGE_STD,
    clip_preprocess_batch,
    clip_preprocess_pil,
    fov_center_crop,
    heading_to_sincos,
    min_side_center_crop,
)
from pigeon_tpu.data.pipeline import (  # noqa: F401
    BenchmarkDataset,
    TabularImageDataset,
    iter_batches,
)
