"""Latent-space analysis of trained yield models.

Capability match for reference `notebooks/z_plotter.py:80-462` (latent PCA
of trained yield models): extract the variational latents z (or imputed
weather for deterministic models), attention-pool them, PCA to 2-D, and
optionally scatter-plot colored by yield. Pure numpy PCA (no sklearn), and
plotting is gated on matplotlib availability.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from weathermodel_tpu.data.yield_data import YieldArrays


def extract_latents(model, params, arrays: YieldArrays, batch_size: int = 64,
                    seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Run the model over the arrays; returns (pooled latents [N, F],
    yields [N]). Works for variational models (outputs[1] = z) and
    deterministic ones (single output -> imputed-weather mean-pool)."""
    lats, ys = [], []
    n = arrays.weather.shape[0]
    key = jax.random.PRNGKey(seed)
    for i in range(0, n, batch_size):
        sl = slice(i, min(i + batch_size, n))
        key, sub = jax.random.split(key)
        out = model.apply(
            params, jnp.asarray(arrays.weather[sl]),
            jnp.asarray(arrays.coords[sl]), jnp.asarray(arrays.year[sl]),
            jnp.asarray(arrays.interval[sl]), jnp.asarray(arrays.mask[sl]),
            jnp.asarray(arrays.y_past[sl]), deterministic=True,
            rngs={"sample": sub},
        )
        z = out[1] if isinstance(out, tuple) else None
        if z is None:
            # deterministic model: use masked-mean of the input weather
            z = jnp.asarray(arrays.weather[sl])
        lats.append(np.asarray(jnp.mean(z, axis=1)))   # pool over seq
        ys.append(arrays.y[sl, 0])
    return np.concatenate(lats), np.concatenate(ys)


def pca_2d(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Plain-SVD PCA; returns (projected [N, 2], explained variance ratio).
    Component signs are canonicalized (largest-|loading| entry positive,
    sklearn svd_flip-style) so projections are reproducible — raw SVD
    signs are data-dependent and arbitrary."""
    xc = x - x.mean(axis=0)
    u, s, vt = np.linalg.svd(xc, full_matrices=False)
    signs = np.sign(vt[np.arange(vt.shape[0]),
                       np.abs(vt).argmax(axis=1)])
    signs[signs == 0] = 1.0
    vt = vt * signs[:, None]
    var = (s ** 2) / max(len(x) - 1, 1)
    ratio = var / var.sum()
    return xc @ vt[:2].T, ratio[:2]


def plot_latent_pca_by_year(latents: np.ndarray, years: np.ndarray,
                            years_to_plot=None, trim_percentile: float = 5.0,
                            out_path: Optional[str] = None):
    """Year-colored latent PCA scatter (reference z_plotter.py:246-356):
    optional year-subset filter, then PCA, then the notebook's PC1
    outlier trim. ✚ robustified vs the notebook: it trims a fixed LEFT
    tail, which silently depends on the arbitrary SVD sign of PC1 — here
    the `trim_percentile` is applied to whichever PC1 tail holds the more
    extreme values (by distance from the median), so the intended
    "drop the extreme outliers" behavior is sign-stable. Returns
    (projected, explained-variance ratio, kept-mask over the filtered
    samples)."""
    years = np.asarray(years)
    if years_to_plot is not None:
        sel = np.isin(years, np.asarray(years_to_plot))
        latents, years = latents[sel], years[sel]
        if len(years) == 0:
            raise ValueError(
                f"years_to_plot={list(years_to_plot)} matched no samples"
            )
    proj, ratio = pca_2d(latents)
    pc1 = proj[:, 0]
    med = np.median(pc1)
    if abs(pc1.min() - med) >= abs(pc1.max() - med):  # extremes on the left
        keep = pc1 > np.percentile(pc1, trim_percentile)
    else:
        keep = pc1 < np.percentile(pc1, 100.0 - trim_percentile)
    proj_k, years_k = proj[keep], years[keep]
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return proj, ratio, keep
    fig, ax = plt.subplots(figsize=(8, 6))
    uniq = np.unique(years_k)
    cmap = plt.get_cmap("tab10")
    for i, yr in enumerate(uniq):
        m = years_k == yr
        ax.scatter(proj_k[m, 0], proj_k[m, 1], s=12,
                   color=cmap(i % 10), label=str(int(yr)))
    ax.set_xlabel(f"PC1 ({ratio[0]:.1%})")
    ax.set_ylabel(f"PC2 ({ratio[1]:.1%})")
    ax.legend(frameon=False, title="year")
    if out_path:
        fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return proj, ratio, keep


def plot_latent_pca(latents: np.ndarray, yields: np.ndarray,
                    out_path: Optional[str] = None):
    """Scatter of the 2-D PCA colored by yield (z_plotter analog)."""
    proj, ratio = pca_2d(latents)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return proj, ratio
    fig, ax = plt.subplots(figsize=(6, 5))
    sc = ax.scatter(proj[:, 0], proj[:, 1], c=yields, cmap="viridis", s=12)
    fig.colorbar(sc, label="yield (normalized)")
    ax.set_xlabel(f"PC1 ({ratio[0]:.1%})")
    ax.set_ylabel(f"PC2 ({ratio[1]:.1%})")
    if out_path:
        fig.savefig(out_path, dpi=120, bbox_inches="tight")
    import matplotlib.pyplot as plt

    plt.close(fig)
    return proj, ratio
