"""ProjectionHead parity vs a torch oracle of reference modules.py:55-76."""

import numpy as np
import jax.numpy as jnp
import torch
from torch import nn

from mae_clip_tpu.interop.torch_import import import_projection_head
from mae_clip_tpu.models.projection import ProjectionHead


class TorchProjectionOracle(nn.Module):
    """Independent torch twin: Linear -> GELU -> Linear -> Dropout ->
    +residual(projected) -> LayerNorm."""

    def __init__(self, embedding_dim, projection_dim=256, dropout=0.1):
        super().__init__()
        self.projection = nn.Linear(embedding_dim, projection_dim)
        self.gelu = nn.GELU()
        self.fc = nn.Linear(projection_dim, projection_dim)
        self.dropout = nn.Dropout(dropout)
        self.layer_norm = nn.LayerNorm(projection_dim)

    def forward(self, x):
        projected = self.projection(x)
        x = self.gelu(projected)
        x = self.fc(x)
        x = self.dropout(x)
        x = x + projected
        return self.layer_norm(x)


def test_projection_head_parity():
    torch.manual_seed(0)
    oracle = TorchProjectionOracle(32, projection_dim=16).eval()
    params = import_projection_head(oracle.state_dict())

    x = np.random.default_rng(0).normal(size=(4, 32)).astype(np.float32)
    with torch.no_grad():
        expected = oracle(torch.tensor(x)).numpy()

    model = ProjectionHead(projection_dim=16, dropout=0.1)
    got = model.apply({"params": params}, jnp.array(x), deterministic=True)
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-6, rtol=1e-5)


def test_projection_head_shapes_and_dropout_rng():
    import jax
    model = ProjectionHead(projection_dim=256, dropout=0.5)
    x = jnp.ones((2, 2048))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out_det = model.apply({"params": params}, x, deterministic=True)
    assert out_det.shape == (2, 256)
    out_a = model.apply({"params": params}, x, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(1)})
    out_b = model.apply({"params": params}, x, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))
