"""Continuous Surface Embeddings (CSE).

The reference ships the CSE *embedders* (densepose/modeling/cse/) but never
registers the ``DensePoseEmbeddingPredictor`` its configs ask for, so every
``configs/cse/*`` crashes at build (SURVEY.md section 2.5). This module
implements the full working CSE inference path:

* ``DensePoseEmbeddingPredictor``: two deconv heads (embedding D=EMBED_SIZE
  and coarse segm) + 2x bilinear upsample, mirroring the chart predictor's
  geometry (predictors/chart.py:45-90),
* vertex embedders ``VertexDirectEmbedder`` (N x D learned table) and
  ``VertexFeatureEmbedder`` (N x K features x K x D projection), both
  L2-normalized (cse/utils.py:25-36); parameters live under
  ``roi_heads.embedder.embedder_<mesh>.*`` so zoo CSE checkpoints align,
* nearest-vertex lookup (cse/utils.py:38-81) as one MXU matmul: argmin over
  the squared-Euclidean distance matrix between pixel embeddings and mesh
  vertex embeddings — no chunked loop needed on TPU.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..checkpoint.spec import ParamSpec, Spec, conv_transpose_spec
from ..ops import conv_transpose2d, resize_bilinear


def embedding_predictor_spec(cfg, prefix: str = "roi_heads.densepose_predictor") -> Spec:
    dim_in = cfg.MODEL.ROI_DENSEPOSE_HEAD.CONV_HEAD_DIM
    n_segm = cfg.MODEL.ROI_DENSEPOSE_HEAD.NUM_COARSE_SEGM_CHANNELS
    embed_dim = cfg.MODEL.ROI_DENSEPOSE_HEAD.CSE.EMBED_SIZE
    k = cfg.MODEL.ROI_DENSEPOSE_HEAD.DECONV_KERNEL
    spec: Spec = {}
    conv_transpose_spec(spec, f"{prefix}.coarse_segm_lowres", dim_in, n_segm, k)
    conv_transpose_spec(spec, f"{prefix}.embed_lowres", dim_in, embed_dim, k)
    return spec


def embedder_spec(cfg, prefix: str = "roi_heads.embedder") -> Spec:
    """One sub-embedder per mesh (cse/embedder.py:66-100)."""
    spec: Spec = {}
    embed_dim = cfg.MODEL.ROI_DENSEPOSE_HEAD.CSE.EMBED_SIZE
    for mesh_name, es in cfg.MODEL.ROI_DENSEPOSE_HEAD.CSE.EMBEDDERS.items():
        base = f"{prefix}.embedder_{mesh_name}"
        etype = es["TYPE"]
        n = es["NUM_VERTICES"]
        if etype == "vertex_direct":
            spec[f"{base}.embeddings"] = ParamSpec((n, embed_dim), "vec")
        elif etype == "vertex_feature":
            kdim = es["FEATURE_DIM"]
            spec[f"{base}.features"] = ParamSpec((n, kdim), "vec")
            spec[f"{base}.embeddings"] = ParamSpec((kdim, embed_dim), "vec")
        else:
            raise ValueError(f"unknown embedder type {etype!r} for mesh {mesh_name}")
    return spec


def embedding_predictor_forward(
    p: Dict,
    x: jnp.ndarray,
    cfg,
    prefix: str = "roi_heads.densepose_predictor",
) -> Dict[str, jnp.ndarray]:
    """(N, H, W, C_head) -> {"embedding": (N, Hout, Wout, D),
    "coarse_segm": (N, Hout, Wout, K)}."""
    k = cfg.MODEL.ROI_DENSEPOSE_HEAD.DECONV_KERNEL
    up = float(cfg.MODEL.ROI_DENSEPOSE_HEAD.UP_SCALE)
    pad = int(k / 2 - 1)

    def head(name):
        y = conv_transpose2d(x, p[f"{prefix}.{name}.weight"], p[f"{prefix}.{name}.bias"],
                             stride=2, padding=pad, kernel_size=k)
        h, w = int(y.shape[-3] * up), int(y.shape[-2] * up)
        return resize_bilinear(y, (h, w), scale=(up, up))

    return {
        "embedding": head("embed_lowres"),
        "coarse_segm": head("coarse_segm_lowres"),
    }


def normalize_embeddings(e: jnp.ndarray, epsilon: float = 1e-6) -> jnp.ndarray:
    """L2-normalize rows (cse/utils.py:25-36)."""
    norm = jnp.linalg.norm(e, axis=-1, keepdims=True)
    return e / jnp.maximum(norm, epsilon)


def vertex_embeddings(p: Dict, mesh_name: str,
                      prefix: str = "roi_heads.embedder") -> jnp.ndarray:
    """Normalized (N, D) vertex embeddings for a mesh."""
    base = f"{prefix}.embedder_{mesh_name}"
    feats_key = f"{base}.features"
    if feats_key in p:
        e = jnp.dot(p[feats_key], p[f"{base}.embeddings"],
                    preferred_element_type=jnp.float32)
    else:
        e = p[f"{base}.embeddings"]
    return normalize_embeddings(e.astype(jnp.float32))


@jax.jit
def closest_vertices(pixel_embeddings: jnp.ndarray,
                     mesh_embeddings: jnp.ndarray) -> jnp.ndarray:
    """(P, D) pixel embeddings x (N, D) mesh embeddings -> (P,) argmin of
    squared Euclidean distance (cse/utils.py:8-22 + 38-81). One matmul on the
    MXU; ||p||^2 is constant per row so argmin needs only -2 p.v + ||v||^2."""
    pe = pixel_embeddings.astype(jnp.float32)
    me = mesh_embeddings.astype(jnp.float32)
    scores = -2.0 * jnp.dot(pe, me.T, preferred_element_type=jnp.float32)
    scores = scores + jnp.sum(me * me, axis=1)[None, :]
    return jnp.argmin(scores, axis=1).astype(jnp.int32)
