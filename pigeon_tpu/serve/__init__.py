"""Model serving: the GeoGuessr-bot HTTP endpoint + AOT artifacts."""

from pigeon_tpu.serve.batching import MicroBatcher  # noqa: F401
from pigeon_tpu.serve.export import (  # noqa: F401
    export_serving_artifact,
    load_serving_artifact,
)
from pigeon_tpu.serve.server import PredictionService, serve  # noqa: F401
