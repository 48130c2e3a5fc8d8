"""Pure geodesy + scoring math: the numerical foundation of the framework.

Every function here is a pure array function with a `jax.numpy` implementation
(vmap/jit/pjit-native, dtype-generic) and — where host-side float64 precision
matters for metric parity — a NumPy twin suffixed `_np`.
"""

from pigeon_tpu.core.geodesy import (  # noqa: F401
    EARTH_RADIUS_KM,
    EARTH_RADIUS_M,
    WGS84_FLATTENING,
    ecef2lla,
    ecef2lla_np,
    haversine,
    haversine_matrix,
    haversine_matrix_np,
    haversine_np,
    lla2ecef,
    lla2ecef_np,
)
from pigeon_tpu.core.scoring import (  # noqa: F401
    geoguessr_score,
    geoguessr_score_np,
    percentage_within_radius,
    smooth_labels,
    smooth_month_labels,
)
