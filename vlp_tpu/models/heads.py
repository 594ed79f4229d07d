"""Clinical MLP + late-fusion head (reference FusionModule.py:58-69, :117).

Clinical branch: Linear(15,32)->BN->ReLU->Linear(32,20)->BN->ReLU->
Linear(20,10)->BN->ReLU over concat(one-hot site[13], age_bin, sex).
Fusion head: Linear(20,1) over concat(image-10, clinical-10)
(reference FusionModule.py:318-331).
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp


class ClinicalMLP(nn.Module):
    hidden: Sequence[int] = (32, 20, 10)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(jnp.float32)
        for i, h in enumerate(self.hidden):
            x = nn.Dense(h, dtype=jnp.float32, param_dtype=jnp.float32,
                         name=f"fc{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class FusionHead(nn.Module):
    """concat(image_logits[10], clinical[10]) -> 1 logit."""

    @nn.compact
    def __call__(self, image_feats, clinical_feats):
        x = jnp.concatenate(
            [image_feats.astype(jnp.float32),
             clinical_feats.astype(jnp.float32)], axis=-1)
        return nn.Dense(1, dtype=jnp.float32, param_dtype=jnp.float32,
                        name="fuse")(x)
