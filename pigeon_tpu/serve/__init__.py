"""Model serving: the GeoGuessr-bot HTTP endpoint."""

from pigeon_tpu.serve.server import PredictionService, serve  # noqa: F401
