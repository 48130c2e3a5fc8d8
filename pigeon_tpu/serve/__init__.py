"""Model serving: the GeoGuessr-bot HTTP endpoint."""

from pigeon_tpu.serve.batching import MicroBatcher  # noqa: F401
from pigeon_tpu.serve.server import PredictionService, serve  # noqa: F401
