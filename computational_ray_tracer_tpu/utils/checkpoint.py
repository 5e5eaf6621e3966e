"""Checkpoint / resume of progressive renders and training state.

The reference has no on-disk persistence; its in-memory progressive film
(rgbsum/weightsum + pixel_index, RayTracerTestApp.h:336-337,420-422) *is* a
resumable representation (SURVEY §5). Here that observation becomes a real
subsystem: serialize ``(film, spp_done, seed, config fingerprint)`` — and
arbitrary parameter pytrees — as npz archives. Resume is *exact* because the
RNG is counter-based: re-rendering sample index i reproduces sample i
regardless of when/where it runs."""

from __future__ import annotations

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from computational_ray_tracer_tpu.ops import film as filmmod


def save_film(path, film: filmmod.Film, meta=None):
    np.savez(path,
             rgb_sum=np.asarray(film.rgb_sum),
             weight_sum=np.asarray(film.weight_sum),
             spp_done=np.asarray(film.spp_done),
             meta=json.dumps(meta or {}))


def load_film(path):
    z = np.load(path, allow_pickle=False)
    film = filmmod.Film(jnp.asarray(z["rgb_sum"]),
                        jnp.asarray(z["weight_sum"]),
                        jnp.asarray(z["spp_done"]))
    meta = json.loads(str(z["meta"]))
    return film, meta


def save_pytree(path, tree):
    """Flatten an arbitrary jax pytree of arrays into an npz archive."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["treedef"] = np.asarray(str(treedef))
    np.savez(path, **arrays)


def load_pytree(path, like):
    """Restore a pytree saved by save_pytree using `like` for structure."""
    z = np.load(path, allow_pickle=False)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    n = len(leaves)
    new_leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


class RenderCheckpointer:
    """Periodic checkpointing for a progressive render loop, with resume.

    Recovery model (SURVEY §5): rendering is stateless per sample pass, so
    crash recovery = reload the last film and continue at spp_done."""

    def __init__(self, directory, every=16):
        self.directory = directory
        self.every = every
        os.makedirs(directory, exist_ok=True)

    @property
    def path(self):
        return os.path.join(self.directory, "film.npz")

    def maybe_save(self, film: filmmod.Film, meta=None):
        if int(film.spp_done) % self.every == 0:
            save_film(self.path, film, meta)
            return True
        return False

    def restore(self, resolution):
        if os.path.exists(self.path):
            return load_film(self.path)
        return filmmod.Film.create(resolution), {}
