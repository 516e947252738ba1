"""Prompt processing with on-disk embedding cache.

Parity target: threestudio/models/prompt_processors/base.py:175-414 — text
embeddings are computed once (in the reference, by a spawned subprocess) and
cached to disk keyed by (model, prompt); training then loads cached arrays.
Here the cache is an .npz per prompt hash; computation is a direct CLIP
forward (no subprocess needed — the encoder isn't resident during the 4D
stage, exactly the memory property the reference's subprocess trick bought).

Also provides view-dependent prompting (front/side/back/overhead suffixes
selected by azimuth/elevation thresholds, stable_diffusion_prompt_processor
parity) and a zeros fallback for weightless smoke runs.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np


@dataclass
class DirectionConfig:
    name: str
    prompt_suffix: str


DIRECTIONS = (
    DirectionConfig("side", ", side view"),
    DirectionConfig("front", ", front view"),
    DirectionConfig("back", ", back view"),
    DirectionConfig("overhead", ", overhead view"),
)


def direction_ids(elevation_deg: np.ndarray, azimuth_deg: np.ndarray,
                  front_threshold: float = 30.0, back_threshold: float = 30.0,
                  overhead_threshold: float = 60.0) -> np.ndarray:
    """Per-view direction index into DIRECTIONS (threestudio semantics)."""
    az = (np.asarray(azimuth_deg) + 180.0) % 360.0 - 180.0
    ids = np.zeros(az.shape, np.int32)  # side
    ids[(az > -front_threshold) & (az < front_threshold)] = 1
    ids[(az > 180 - back_threshold) | (az < -180 + back_threshold)] = 2
    ids[np.asarray(elevation_deg) > overhead_threshold] = 3
    return ids


class PromptProcessor:
    """Compute-or-load cached text embeddings."""

    def __init__(
        self,
        encode_fn: Optional[Callable[[List[str]], np.ndarray]] = None,
        cache_dir: str = ".cache/text_embeddings",
        model_id: str = "clip-text",
    ):
        self.encode_fn = encode_fn
        self.cache_dir = cache_dir
        self.model_id = model_id
        os.makedirs(cache_dir, exist_ok=True)

    def _cache_path(self, prompt: str) -> str:
        h = hashlib.md5(f"{self.model_id}:{prompt}".encode()).hexdigest()
        return os.path.join(self.cache_dir, f"{h}.npz")

    def embed(self, prompt: str) -> np.ndarray:
        path = self._cache_path(prompt)
        if os.path.exists(path):
            return np.load(path)["emb"]
        if self.encode_fn is None:
            raise RuntimeError(
                f"No cached embedding for {prompt!r} and no text encoder available")
        emb = np.asarray(self.encode_fn([prompt])[0])
        np.savez(path, emb=emb)
        return emb

    def __call__(self, prompt: str, negative_prompt: str = "",
                 view_dependent: bool = False
                 ) -> Dict[str, np.ndarray]:
        """Returns {'cond': (77, D) or (4, 77, D) when view-dependent,
        'uncond': (77, D)} — the prompt_utils surface."""
        uncond = self.embed(negative_prompt)
        if view_dependent:
            cond = np.stack([self.embed(prompt + d.prompt_suffix)
                             for d in DIRECTIONS])
        else:
            cond = self.embed(prompt)
        return {"cond": cond, "uncond": uncond}


def encode_prompt_or_zeros(prompt: str, negative_prompt: str, n_views: int,
                           hidden_size: int = 768, max_length: int = 77,
                           model_root: Optional[str] = None,
                           text_params=None):
    """Encode with a real tokenizer+encoder when available; zeros otherwise
    (weightless smoke mode)."""
    import jax.numpy as jnp

    if model_root is not None and text_params is not None:
        from animate3d_tpu.utils.tokenizer import ClipTokenizer, find_tokenizer_files
        from animate3d_tpu.models.clip import CLIPTextModel

        tok = ClipTokenizer(*find_tokenizer_files(model_root), max_length=max_length)
        model = CLIPTextModel()
        ids = tok([prompt, negative_prompt])
        out = model.apply(text_params, jnp.asarray(ids))
        cond = jnp.tile(out[0:1], (n_views, 1, 1))
        uncond = jnp.tile(out[1:2], (n_views, 1, 1))
        return cond, uncond
    print("[prompt] WARNING: no text encoder — zero text embeddings (smoke mode)")
    z = jnp.zeros((n_views, max_length, hidden_size), jnp.float32)
    return z, z
