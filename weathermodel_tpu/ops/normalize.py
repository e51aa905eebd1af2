"""Input normalization for temporal/spatial conditioning features.

Matches reference `src/utils/utils.py:63-74` exactly:
  year     -> (year - 1970) / 100
  interval -> interval / 30
  lat      -> lat / 360      (dataset covers ~2x more lat range than lon,
  lon      -> lon / 180       so these divisors equalize the ranges)
Pure function — no in-place clone dance needed in JAX.
"""

import jax.numpy as jnp


def normalize_year_interval_coords(year, interval, coords):
    year = (year - 1970.0) / 100.0
    interval = interval / 30.0
    lat = coords[..., 0] / 360.0
    lon = coords[..., 1] / 180.0
    coords = jnp.stack([lat, lon], axis=-1)
    return year, interval, coords
