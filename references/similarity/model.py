"""Embedding model for metric learning (counterpart of reference
``references/similarity/model.py`` EmbeddingNet): any vision_tpu
classification backbone re-headed to an embedding dim, L2-normalized."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class EmbeddingNet(nn.Module):
    """Backbone logits -> L2-normalized embeddings.

    ``backbone_name`` is any registry model; its classifier head is built
    with ``num_classes=embedding_dim`` so no surgery is needed (the
    reference does the same: resnet50(num_classes=128))."""

    backbone_name: str = "resnet50"
    embedding_dim: int = 128

    def setup(self):
        from vision_tpu.models import get_model_builder

        builder = get_model_builder(self.backbone_name)
        model = builder(num_classes=self.embedding_dim)
        self.backbone = model.module

    def __call__(self, x, train: bool = False):
        emb = self.backbone(x, train=train)
        return emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12
        )


def build_embedding_model(backbone_name: str = "resnet50",
                          embedding_dim: int = 128):
    """Construct module + initialized variables (64x64 init input; params
    are input-size independent)."""
    module = EmbeddingNet(
        backbone_name=backbone_name, embedding_dim=embedding_dim
    )
    variables = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    return module, variables
