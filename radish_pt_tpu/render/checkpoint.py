"""Render-state checkpoint / resume.

The reference has NO checkpointing (SURVEY.md §5): progressive accumulation
lives only in VRAM and dies on camera change or exit (main.cpp:177-182).
Here the whole render state is a pytree, so checkpointing is a numpy save of
the accumulation buffers + sampler counters + ReSTIR reservoirs + SVGF
history — a long progressive render survives restarts and can keep
accumulating.
"""

from __future__ import annotations

import json
import os

import numpy as np

import jax
import jax.numpy as jnp

FORMAT_VERSION = 1


def save_checkpoint(renderer, path: str) -> str:
    """Serialize a Renderer's progressive state to ``path`` (.npz)."""
    r = renderer
    arrays = {
        "direct": np.asarray(r.direct),
        "indirect": np.asarray(r.indirect),
        "res_li": np.asarray(r.reservoir.li),
        "res_wi": np.asarray(r.reservoir.wi),
        "res_dist": np.asarray(r.reservoir.dist),
        "res_num": np.asarray(r.reservoir.num),
        "res_weight": np.asarray(r.reservoir.weight),
        "gbuf_normal": np.asarray(r.gbuf_last.normal),
        "gbuf_prim": np.asarray(r.gbuf_last.prim_id),
        "gbuf_depth": np.asarray(r.gbuf_last.depth),
        "svgf_color": np.asarray(r.svgf_direct.accum_color),
        "svgf_moment": np.asarray(r.svgf_direct.accum_moment),
        "svgf_i_color": np.asarray(r.svgf_indirect.accum_color),
        "svgf_i_moment": np.asarray(r.svgf_indirect.accum_moment),
        "cam_position": np.asarray(r.cam.position),
        "cam_rotation": np.asarray(r.cam.rotation),
    }
    meta = {
        "version": FORMAT_VERSION,
        "iteration": r.state.iteration,
        "looper": r.state.looper,
        "first_frame": r.first_frame,
        "width": r.cam.width,
        "height": r.cam.height,
        "image_name": r.state.image_name,
        # mesh-mode buffers are tile-padded; normals may be hemi-oct [N, 2]
        "n_alloc": int(r.n_alloc),
        "normal_dim": int(np.asarray(r.gbuf_last.normal).shape[-1]),
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)
    return os.path.abspath(path)


def load_checkpoint(renderer, path: str) -> None:
    """Restore progressive state into a Renderer built for the same scene."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    if meta["version"] != FORMAT_VERSION:
        raise ValueError(f"checkpoint version {meta['version']} unsupported")
    if (meta["width"], meta["height"]) != (renderer.cam.width, renderer.cam.height):
        raise ValueError(
            f"checkpoint resolution {meta['width']}x{meta['height']} != "
            f"renderer {renderer.cam.width}x{renderer.cam.height}"
        )
    r = renderer
    ck_alloc = meta.get("n_alloc", data["direct"].shape[0])
    if ck_alloc != r.n_alloc:
        raise ValueError(
            f"checkpoint pixel buffers are {ck_alloc} rows but this renderer "
            f"allocates {r.n_alloc} (mesh tile padding differs — resume with "
            f"the same --mesh tile count it was saved with)"
        )
    ck_ndim = meta.get("normal_dim", data["gbuf_normal"].shape[-1])
    have_ndim = np.asarray(r.gbuf_last.normal).shape[-1]
    if ck_ndim != have_ndim:
        raise ValueError(
            f"checkpoint G-buffer normals are {ck_ndim}-component but this "
            f"renderer uses {have_ndim} (encode_normal setting differs)"
        )
    r.direct = jnp.asarray(data["direct"])
    r.indirect = jnp.asarray(data["indirect"])
    r.reservoir = r.reservoir.replace(
        li=jnp.asarray(data["res_li"]),
        wi=jnp.asarray(data["res_wi"]),
        dist=jnp.asarray(data["res_dist"]),
        num=jnp.asarray(data["res_num"]),
        weight=jnp.asarray(data["res_weight"]),
    )
    r.gbuf_last = r.gbuf_last.replace(
        normal=jnp.asarray(data["gbuf_normal"]),
        prim_id=jnp.asarray(data["gbuf_prim"]),
        depth=jnp.asarray(data["gbuf_depth"]),
    )
    r.svgf_direct = r.svgf_direct.replace(
        accum_color=jnp.asarray(data["svgf_color"]),
        accum_moment=jnp.asarray(data["svgf_moment"]),
    )
    if "svgf_i_color" in data:  # split-SVGF history (absent in old files)
        r.svgf_indirect = r.svgf_indirect.replace(
            accum_color=jnp.asarray(data["svgf_i_color"]),
            accum_moment=jnp.asarray(data["svgf_i_moment"]),
        )
    if r.mesh is not None:
        # re-place restored pixel state sharded over the mesh
        from ..parallel.sharding import shard_image

        place = lambda t: jax.tree_util.tree_map(
            lambda x: shard_image(r.mesh, x, r.cam), t
        )
        r.direct = place(r.direct)
        r.indirect = place(r.indirect)
        r.reservoir = place(r.reservoir)
        r.gbuf_last = place(r.gbuf_last)
    from ..scene.camera import update_camera

    r.cam = update_camera(
        r.cam.replace(
            position=jnp.asarray(data["cam_position"]),
            rotation=jnp.asarray(data["cam_rotation"]),
        )
    )
    r.last_cam = r.cam
    r.state.iteration = int(meta["iteration"])
    r.state.looper = int(meta["looper"])
    r.first_frame = bool(meta["first_frame"])
