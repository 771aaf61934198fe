"""Checkpoint / resume for long progressive renders and optimizations.

The reference's only "resume" is the persistent per-pixel path-state buffer
that lives for one process (``src/main.cpp:283-290,451``; SURVEY §5).  Here
the progressive accumulation state (radiance sum, alpha sum, sample count,
RNG seed) plus any differentiable scene leaves are a pytree serialized to a
single ``.npz`` -- restarting a render or an inverse-rendering run resumes
*exactly* (counter-based RNG makes sample i identical regardless of when it
is drawn).
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from photorealistic_rendering_using_opencl_tpu.models.pathtracer import ProgressiveState
from photorealistic_rendering_using_opencl_tpu.scene.types import SceneData

_FORMAT_VERSION = 1


def save_checkpoint(path: str, state: ProgressiveState,
                    scene: SceneData | None = None,
                    extra: dict[str, Any] | None = None) -> None:
    """Atomically write the progressive state (+ optional scene pytree)."""
    arrays: dict[str, np.ndarray] = {}
    meta: dict[str, Any] = {"version": _FORMAT_VERSION, "extra": extra or {}}

    for name, val in state._asdict().items():
        arrays[f"state.{name}"] = np.asarray(val)
    if scene is not None:
        for f in dataclasses.fields(scene):
            arrays[f"scene.{f.name}"] = np.asarray(getattr(scene, f.name))
        meta["has_scene"] = True
    arrays["meta"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8).copy()

    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez_compressed(fh, **arrays)
    os.replace(tmp, path)


def load_checkpoint(path: str, scene_template: SceneData | None = None):
    """Returns (ProgressiveState, SceneData-or-None, extra dict)."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"]).decode())
        if meta.get("version") != _FORMAT_VERSION:
            raise ValueError(f"unknown checkpoint version in {path}")
        state = ProgressiveState(**{
            name: jnp.asarray(z[f"state.{name}"])
            for name in ProgressiveState._fields})
        scene = None
        if meta.get("has_scene"):
            if scene_template is None:
                raise ValueError(
                    "checkpoint contains a scene; pass scene_template")
            kwargs = {f.name: jnp.asarray(z[f"scene.{f.name}"])
                      for f in dataclasses.fields(scene_template)}
            scene = SceneData(**kwargs)
        return state, scene, meta.get("extra", {})
