"""pigeon_tpu — a TPU-native planet-scale image geolocation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of PIGEON
("PIGEON: Predicting Image Geolocations", CVPR 2024; reference implementation
LukasHaas/PIGEON): CLIP-style vision encoders, semantic geocell classification
with haversine-smoothed labels, multi-task geographic prediction heads,
ProtoNet-style guess refinement, GeoGuessr-grade evaluation metrics, and a
serving stack for the GeoGuessr bot — all designed for TPU hardware
(SPMD over device meshes, functional transforms, Pallas kernels on the hot
paths) rather than translated from the reference's PyTorch design.

Layout:
    core/     pure geodesy + scoring math (jnp + numpy twins)
    kernels/  Pallas TPU kernels (fused attention, haversine-smoothing, top-k)
    models/   Flax models: CLIP ViT towers, geocell head, proto refiner
    data/     input pipeline: image ops, caption synthesis, dataset builders
    geocell/  offline geocell creation (geometry, OPTICS, Voronoi, prototypes)
    train/    pjit train/eval loops, sharding, Orbax checkpointing, metrics
    serve/    HTTP model server speaking the Chrome-extension bot protocol
    cli/      `python -m pigeon_tpu.cli.run {pretrain,finetune,embed,evaluate}`
"""

__version__ = "0.1.0"

from pigeon_tpu.config import (  # noqa: F401
    PigeonConfig,
    pigeon_config,
    pigeotto_config,
)
