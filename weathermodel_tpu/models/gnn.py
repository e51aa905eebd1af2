"""GNN-RNN yield baseline (GraphSAGE over the county graph).

Capability match for reference `src/crop_yield/models/gnnrnn_yield_model.py`
(SURVEY.md §2.6), redesigned TPU-first: instead of DGL neighbor-sampled
sparse SAGEConv blocks (reference :130-246 + MultiLayerNeighborSampler
[10,10]), the county graph (a few hundred to a few thousand nodes) is a
DENSE row-normalized adjacency matrix and mean aggregation is ONE MXU
matmul `A_norm @ H` per layer — full-graph training, no sampling variance,
no host<->device graph traffic.

Architecture preserved exactly:
* CNNEncoder (reference :12-99): weather [*, 6, 52] conv pyramid
  6->64->128->256->512 (k 9/3/3/3, AvgPool/2 each) -> FC 512->80; soil
  [*, 11, 6] conv 11->16->32->64 (k 3/3/2, no pooling) -> FC 64->40;
  concat -> 120 features.
* node features: 120 + [coords_norm, coords_norm^2, 0.5*coords_norm,
  y_past_i] = 127 (reference :185-199).
* 3x SAGEConv(mean): h' = W_self h + W_neigh mean_N(h); relu+dropout after
  EVERY layer (the reference's `l != len(self.layers)` is always true —
  quirk preserved, reference :226-233).
* LSTM(z_dim) over years -> MLP(z_dim -> z_dim/2 -> 1), last year's output.
"""

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from weathermodel_tpu.models.blocks import torch_dense
from weathermodel_tpu.models.cnn import _avg_pool_1d, _torch_conv
from weathermodel_tpu.ops.normalize import normalize_year_interval_coords


def build_county_adjacency(n_counties: int) -> np.ndarray:
    """Row-normalized dense adjacency with self-loops and +/-2-index
    neighbors (reference gnnrnn_dataloader.py:238-267)."""
    adj = np.zeros((n_counties, n_counties), dtype=np.float32)
    np.fill_diagonal(adj, 1.0)
    for i in range(n_counties):
        for j in range(max(0, i - 2), min(n_counties, i + 3)):
            if i != j:
                adj[i, j] = adj[j, i] = 1.0
    return adj / adj.sum(axis=1, keepdims=True)


class GNNCNNEncoder(nn.Module):
    """weather [N, Y, 6, 52] + soil [N, Y, 11, 6] -> [N*Y, 120]
    (applied per year by the caller; here we fold years into the batch)."""

    @nn.compact
    def __call__(self, weather, soil):
        n = weather.shape[0]
        # weather: [N, 6, 52] -> [N, 52, 6] (flax convs are NLC)
        w = weather.transpose(0, 2, 1)
        w = nn.relu(_torch_conv(64, 9, 6 * 9, name="wconv1")(w))
        w = _avg_pool_1d(w)
        w = nn.relu(_torch_conv(128, 3, 64 * 3, name="wconv2")(w))
        w = _avg_pool_1d(w)
        w = nn.relu(_torch_conv(256, 3, 128 * 3, name="wconv3")(w))
        w = _avg_pool_1d(w)
        w = nn.relu(_torch_conv(512, 3, 256 * 3, name="wconv4")(w))
        w = _avg_pool_1d(w)                       # [N, 1, 512]
        w = nn.relu(torch_dense(80, 512, name="wfc")(w.reshape(n, 512)))

        s = soil.transpose(0, 2, 1)               # [N, 6, 11]
        s = nn.relu(_torch_conv(16, 3, 11 * 3, name="sconv1")(s))   # len 4
        s = nn.relu(_torch_conv(32, 3, 16 * 3, name="sconv2")(s))   # len 2
        s = nn.relu(_torch_conv(64, 2, 32 * 2, name="sconv3")(s))   # len 1
        s = nn.relu(torch_dense(40, 64, name="sfc")(s.reshape(n, 64)))
        return jnp.concatenate([w, s], axis=1)    # [N, 120]


class SAGEConv(nn.Module):
    """Mean-aggregator GraphSAGE layer via dense normalized adjacency."""

    out_dim: int
    in_dim: int

    @nn.compact
    def __call__(self, h, adj_norm):
        neigh = jnp.matmul(adj_norm, h)           # mean over neighbors (MXU)
        return (torch_dense(self.out_dim, self.in_dim, name="fc_self")(h)
                + torch_dense(self.out_dim, self.in_dim,
                              name="fc_neigh")(neigh))


class GNNRNNYieldModel(nn.Module):
    """Full-graph forward: one "batch" = all counties for one target year.

    weather [N, Y, 6, 52], soil [N, Y, 11, 6], coords [N, 2] (raw),
    y_past [N, Y], adj_norm [N, N] -> [N, 1].
    """

    n_past_years: int = 5
    z_dim: int = 128
    n_layers: int = 3
    dropout: float = 0.1

    @nn.compact
    def __call__(self, weather, soil, coords, y_past, adj_norm,
                 deterministic: bool = True):
        n, n_years = weather.shape[:2]
        _, _, coords_n = normalize_year_interval_coords(
            jnp.zeros((n, 1)), jnp.ones((n, 1)), coords
        )
        # fold years into the conv batch, then un-fold
        cnn = GNNCNNEncoder(name="encoder")(
            weather.reshape(n * n_years, 6, 52),
            soil.reshape(n * n_years, 11, 6),
        ).reshape(n, n_years, 120)

        layers = [SAGEConv(self.z_dim, 127 if i == 0 else self.z_dim,
                           name=f"sage_{i}") for i in range(self.n_layers)]
        drop = nn.Dropout(self.dropout, deterministic=deterministic)

        hs = []
        for i in range(n_years):
            extra = jnp.concatenate(
                [coords_n, coords_n ** 2, coords_n * 0.5,
                 y_past[:, i:i + 1]], axis=1,
            )                                     # [N, 7]
            h = jnp.concatenate([cnn[:, i], extra], axis=1)  # [N, 127]
            for layer in layers:
                h = layer(h, adj_norm)
                h = drop(nn.relu(h))              # after EVERY layer (quirk)
            hs.append(h)
        hs = jnp.stack(hs, axis=1)                # [N, Y, z]

        out = nn.RNN(nn.OptimizedLSTMCell(self.z_dim), name="lstm")(hs)
        x = nn.relu(torch_dense(self.z_dim // 2, self.z_dim,
                                name="reg_fc1")(out[:, -1]))
        return torch_dense(1, self.z_dim // 2, name="reg_fc2")(x)
