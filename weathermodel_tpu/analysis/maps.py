"""Geographic scatter maps of county-level values.

Capability analog of reference `notebooks/boundary_map.py` (county/state
boundary plots of yields and errors): plots values at county coordinates,
optionally overlaying state boundary polylines from a state_coords.json
(same schema as the reference's `data/state_coords.json`). Matplotlib is
optional; without it the function returns the assembled arrays."""

import json
import os
from typing import Optional

import numpy as np


def plot_county_map(lats, lons, values, title: str = "",
                    state_coords_path: Optional[str] = None,
                    out_path: Optional[str] = None):
    lats, lons, values = map(np.asarray, (lats, lons, values))
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return lats, lons, values
    fig, ax = plt.subplots(figsize=(8, 5))
    if state_coords_path and os.path.exists(state_coords_path):
        with open(state_coords_path) as f:
            states = json.load(f)
        for coords in states.values():
            arr = np.asarray(coords, dtype=float)
            if arr.ndim == 2 and arr.shape[1] == 2:
                ax.plot(arr[:, 1], arr[:, 0], lw=0.5, color="gray")
    sc = ax.scatter(lons, lats, c=values, cmap="RdYlGn", s=18,
                    edgecolors="none")
    fig.colorbar(sc, label=title or "value")
    ax.set_xlabel("longitude")
    ax.set_ylabel("latitude")
    if title:
        ax.set_title(title)
    if out_path:
        fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return lats, lons, values
