"""Model summaries: parameter counts and layout (torchsummary parity).

The reference prints `torchsummary.summary` dumps and model `__str__`
descriptions during setup (`training/train_modes.py:3`,
`evaluation/evaluate.py:48`, `models/super_guessr.py:486-501`); this is the
functional equivalent over parameter pytrees.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np


def param_count(params) -> int:
    return sum(int(np.prod(np.shape(leaf)))
               for leaf in jax.tree_util.tree_leaves(params))


def param_summary(params, max_depth: int = 2) -> Dict[str, int]:
    """Parameter counts grouped by path prefix (up to `max_depth`)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out: Dict[str, int] = {}
    for path, leaf in flat:
        keys = [str(getattr(k, "key", getattr(k, "name", k)))
                for k in path][:max_depth]
        key = "/".join(keys)
        out[key] = out.get(key, 0) + int(np.prod(np.shape(leaf)))
    return dict(sorted(out.items()))


def describe(params, name: str = "model") -> str:
    """Human-readable summary string."""
    groups = param_summary(params)
    total = param_count(params)
    lines = [f"{name}: {total:,} parameters"]
    for key, count in groups.items():
        lines.append(f"  {key:<40s} {count:>14,}  "
                     f"({100.0 * count / total:5.1f}%)")
    return "\n".join(lines)
