"""Grid-search hyperparameter-sensitivity analysis + plots.

Capability match for `notebooks/data_plotter.ipynb` (reference): load the
per-model grid-search TSVs written by `cli/grid_search.py`, extract the R²
point estimate from the "mean ± std" string, reduce to best-R² per
hyperparameter value, and draw the 3-panel comparison figure
(batch size / learning rate / beta sensitivity across models).

Pure pandas/matplotlib — no device code. Synthetic-data tested
(tests/test_analysis.py) so no real sweep artifacts are required.
"""

from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

# Display metadata per model key (reference data_plotter.ipynb AVAILABLE_MODELS)
MODEL_STYLE = {
    "weatherformer": dict(display="VITA", color="#F24236", marker="s"),
    "bert": dict(display="T-BERT", color="#2E86AB", marker="o"),
    "simmtm": dict(display="SimMTM", color="#28A745", marker="D"),
    "gnnrnn": dict(display="GNN-RNN", color="#2D3748", marker="^"),
    "chronos": dict(display="Chronos", color="#8B5CF6", marker="p"),
}


def load_grid_results(path: str, r2_column: str = "year_15_r2") -> pd.DataFrame:
    """Read a grid-search TSV and add a numeric `r2` column parsed from the
    "mean ± std" string (reference data_plotter cell 2)."""
    df = pd.read_csv(path, sep="\t")
    df["r2"] = (
        df[r2_column].astype(str).str.split(" ± ").str[0].astype(float)
    )
    return df


def best_r2_by(df: pd.DataFrame, column: str,
               values: Sequence) -> List[float]:
    """Best (max) R² for each hyperparameter value; NaN when absent."""
    out = []
    for v in values:
        sel = df[df[column] == v]["r2"]
        out.append(float(sel.max()) if len(sel) else float("nan"))
    return out


def hyperparam_sensitivity(
    model_data: Dict[str, pd.DataFrame],
    batch_sizes: Sequence[int] = (16, 32, 64),
    learning_rates: Sequence[float] = (0.00025, 0.0005, 0.001),
    betas: Sequence[float] = (0.0, 0.0001, 0.001),
) -> dict:
    """Reduce loaded grids to the notebook's three panel tables."""
    return {
        "batch": {k: best_r2_by(d, "batch_size", batch_sizes)
                  for k, d in model_data.items()},
        "lr": {k: best_r2_by(d, "init_lr", learning_rates)
               for k, d in model_data.items()},
        # beta sweep is meaningful only for the variational family
        "beta": {k: best_r2_by(d, "beta", betas)
                 for k, d in model_data.items() if k == "weatherformer"},
        "batch_sizes": list(batch_sizes),
        "learning_rates": list(learning_rates),
        "betas": list(betas),
    }


def plot_hyperparam_sensitivity(model_data: Dict[str, pd.DataFrame],
                                out_path: Optional[str] = None, **kwargs):
    """The 3-panel (batch / lr / beta) best-R² comparison figure."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    tables = hyperparam_sensitivity(model_data, **kwargs)
    fig, (ax1, ax2, ax3) = plt.subplots(1, 3, figsize=(20, 6))

    def panel(ax, xvals, results, xlabel, legend=False):
        x = np.arange(len(xvals))
        for key, ys in results.items():
            style = MODEL_STYLE.get(key, dict(display=key, color=None,
                                              marker="o"))
            ax.plot(x, ys, marker=style["marker"], color=style["color"],
                    label=style["display"])
        ax.set_xticks(x)
        ax.set_xticklabels([str(v) for v in xvals])
        ax.set_xlabel(xlabel)
        ax.set_ylabel("Best R²")
        if legend:
            ax.legend(frameon=False)

    panel(ax1, tables["batch_sizes"], tables["batch"], "Batch size",
          legend=True)
    panel(ax2, tables["learning_rates"], tables["lr"], "Learning rate")
    panel(ax3, tables["betas"], tables["beta"], "β")
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, bbox_inches="tight")
    return fig
