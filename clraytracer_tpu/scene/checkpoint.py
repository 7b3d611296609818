"""Full-scene checkpoint: save/restore the complete renderable state.

The reference's only persistence is the per-mesh ``.clm`` cache
(AssetManager.cpp:291-361) — runtime state (registered instances, live
material edits, texture pool) dies with the process (SURVEY.md §5
"Checkpoint / resume: none for runtime state"). Here the whole ``Scene``
pytree — triangles, BVH, materials (including live edits), texture atlas,
instances, cluster tables — round-trips through one compressed ``.npz``:
array leaves under path keys, static pytree metadata (mesh ranges, roots,
procedural-texture descriptors, ...) as tagged JSON. Restoring yields a
scene that renders bit-identically, with no re-import, re-build, or
re-clustering.

Extra JSON-able state (camera config, sun angle, training step, ...) rides
along via ``extras``.
"""

from __future__ import annotations

import dataclasses
import io
import json
from pathlib import Path
from typing import Any

import numpy as np

import jax.numpy as jnp

from clraytracer_tpu.scene.procedural_tex import ProceduralTexture
from clraytracer_tpu.scene.types import (
    BVH,
    Clusters,
    Instances,
    Materials,
    PackedTables,
    Scene,
    TextureAtlas,
    Triangles,
)
from clraytracer_tpu.utils.logging import get_logger

log = get_logger(__name__)

#: Bump on layout changes (the reference's CMeshVersion discipline,
#: AssetManager.cpp:291). Mismatch raises — a checkpoint is authoritative
#: state, not a cache that can fall back to re-import.
CHECKPOINT_VERSION = 2  # v2: Materials.transmission (refraction channel)

SNAPSHOT_SUFFIX = ".clsnap.npz"

_CLASSES: dict[str, type] = {
    c.__name__: c
    for c in (
        Scene,
        Triangles,
        BVH,
        Materials,
        TextureAtlas,
        Instances,
        Clusters,
        PackedTables,
    )
}


def _enc_static(v: Any) -> Any:
    """Tagged JSON encoding of static pytree metadata values."""
    if isinstance(v, ProceduralTexture):
        return {"__ptex__": _enc_static_dict(dataclasses.asdict(v))}
    if isinstance(v, tuple):
        return {"__tuple__": [_enc_static(x) for x in v]}
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if v is None or isinstance(v, (int, float, str, bool)):
        return v
    raise TypeError(f"unserializable static value: {type(v)!r}")


def _enc_static_dict(d: dict) -> dict:
    return {k: _enc_static(tuple(v) if isinstance(v, list) else v)
            for k, v in d.items()}


def _dec_static(v: Any) -> Any:
    if isinstance(v, dict):
        if "__ptex__" in v:
            kw = {k: _dec_static(x) for k, x in v["__ptex__"].items()}
            return ProceduralTexture(**kw)
        if "__tuple__" in v:
            return tuple(_dec_static(x) for x in v["__tuple__"])
    if isinstance(v, list):
        return tuple(_dec_static(x) for x in v)
    return v


def _is_array(v: Any) -> bool:
    return isinstance(v, (np.ndarray, jnp.ndarray))


def _flatten(obj: Any, prefix: str, arrays: dict, statics: dict) -> None:
    if obj is None:
        statics[prefix] = {"__none__": True}
        return
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        statics[prefix] = {"__class__": type(obj).__name__}
        for f in dataclasses.fields(obj):
            _flatten(getattr(obj, f.name), f"{prefix}.{f.name}",
                     arrays, statics)
        return
    if _is_array(obj):
        arrays[prefix] = np.asarray(obj)
        return
    statics[prefix] = {"__static__": _enc_static(obj)}


def _rebuild(prefix: str, arrays: dict, statics: dict) -> Any:
    if prefix in arrays:
        return jnp.asarray(arrays[prefix])
    node = statics[prefix]
    if "__none__" in node:
        return None
    if "__static__" in node:
        return _dec_static(node["__static__"])
    cls = _CLASSES[node["__class__"]]
    kwargs = {}
    missing_required = []
    for f in dataclasses.fields(cls):
        key = f"{prefix}.{f.name}"
        if key not in arrays and key not in statics:
            # field newer than this checkpoint: fall back to the dataclass
            # default — but fail LOUDLY when there is none, instead of the
            # opaque TypeError cls(**kwargs) would raise
            if (
                f.default is dataclasses.MISSING
                and f.default_factory is dataclasses.MISSING
            ):
                missing_required.append(f.name)
            continue
        kwargs[f.name] = _rebuild(key, arrays, statics)
    if missing_required:
        raise ValueError(
            f"checkpoint is missing required field(s) "
            f"{missing_required} of {cls.__name__} (saved by an older "
            f"version — re-export the scene with the current code)"
        )
    return cls(**kwargs)


def save_scene(
    scene: Scene, path: str | Path, extras: dict[str, Any] | None = None
) -> Path:
    """Write the full scene (+ optional JSON-able ``extras``) to ``path``.

    One compressed npz: array leaves under ``a:<dotted path>`` keys, static
    metadata and extras in a ``__meta__`` JSON blob.
    """
    path = Path(path)
    arrays: dict[str, np.ndarray] = {}
    statics: dict[str, Any] = {}
    _flatten(scene, "scene", arrays, statics)
    meta = {
        "version": CHECKPOINT_VERSION,
        "statics": statics,
        "extras": extras or {},
    }
    buf = io.BytesIO()
    np.savez_compressed(
        buf,
        __meta__=np.frombuffer(
            json.dumps(meta).encode("utf-8"), dtype=np.uint8
        ),
        **{f"a:{k}": v for k, v in arrays.items()},
    )
    path.write_bytes(buf.getvalue())
    log.info("saved scene checkpoint %s (%d arrays, %d KiB)",
             path, len(arrays), len(buf.getvalue()) // 1024)
    return path


def load_scene(path: str | Path) -> tuple[Scene, dict[str, Any]]:
    """Restore ``(scene, extras)`` from a :func:`save_scene` checkpoint."""
    path = Path(path)
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode("utf-8"))
        if meta["version"] != CHECKPOINT_VERSION:
            raise ValueError(
                f"checkpoint version {meta['version']} != "
                f"{CHECKPOINT_VERSION} ({path})"
            )
        arrays = {k[2:]: z[k] for k in z.files if k.startswith("a:")}
    scene = _rebuild("scene", arrays, meta["statics"])
    return scene, meta["extras"]
