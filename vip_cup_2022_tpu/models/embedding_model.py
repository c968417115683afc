"""EmbeddingModel (tfimm models/embedding_model.py:5-40): backbone features
-> bias-free Dense -> scale-free BatchNorm. For embedding-learning tasks
(e.g. face recognition)."""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops import BatchNorm


class EmbeddingModel(nn.Module):
    backbone: Any  # any registry model module (called with features_only=True)
    embed_dim: int

    @nn.compact
    def __call__(self, x, training: bool = False):
        feats = self.backbone(x, training=training, features_only=True)
        if feats.ndim == 4:  # conv feature map -> pooled vector
            feats = jnp.mean(feats.astype(jnp.float32), axis=(1, 2))
        elif feats.ndim == 3:  # token sequence -> cls/first token
            feats = feats[:, 0].astype(jnp.float32)
        y = nn.Dense(self.embed_dim, use_bias=True, name="emb_fc")(feats)
        return BatchNorm(momentum=0.99, epsilon=1e-3, use_scale=False, name="emb_bn")(
            y, training=training
        )
