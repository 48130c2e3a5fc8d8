"""Flax models: CLIP towers, geocell head, proto refiner, layers."""

from pigeon_tpu.models.clip import (  # noqa: F401
    CLIPModel,
    CLIPTextTower,
    CLIPVisionTower,
    clip_contrastive_loss,
)
from pigeon_tpu.models.embedder import ClipEmbedder, token_mean_embedding  # noqa: F401
from pigeon_tpu.models.geocell_head import (  # noqa: F401
    GeocellHead,
    GeocellOutput,
    geocell_loss,
)
from pigeon_tpu.models.hf_import import (  # noqa: F401
    import_clip_params,
    import_text_tower_params,
    import_vision_tower_params,
)
