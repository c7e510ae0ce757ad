"""Procedural stand-in scenes.

The reference's canonical assets (``assets/castle.vox``, 88 MB, and
``assets/teapot.vox``) are git-LFS pointer stubs in the snapshot
(SURVEY §6), so benchmarks and demos use deterministic procedural
replacements of comparable scale: a walled castle with towers and a keep
on a terrain slab, and a superellipsoid teapot. Both are emitted as real
``.vox`` bytes so every run exercises the full parser → tree → geometry
path.
"""

from __future__ import annotations

import numpy as np

from dust_tpu.vox import parser as vp

__all__ = ["make_castle_vox", "make_teapot_vox", "castle_scene_bytes", "teapot_scene_bytes"]

# Palette indices (1-based voxel color indices).
GRASS_A, GRASS_B, STONE_A, STONE_B, STONE_C, ROOF, WOOD, WATER, GOLD = range(1, 10)

_PALETTE_RGB = {
    GRASS_A: (86, 125, 70, 255),
    GRASS_B: (74, 111, 58, 255),
    STONE_A: (158, 158, 158, 255),
    STONE_B: (140, 140, 145, 255),
    STONE_C: (120, 120, 128, 255),
    ROOF: (178, 52, 44, 255),
    WOOD: (110, 78, 48, 255),
    WATER: (52, 88, 148, 255),
    GOLD: (212, 175, 55, 255),
}


def _palette() -> np.ndarray:
    p = vp.DEFAULT_PALETTE.copy()
    for i, rgba in _PALETTE_RGB.items():
        p[i] = rgba
    return p


def _grid_to_voxels(grid: np.ndarray) -> np.ndarray:
    """Dense (X,Y,Z) uint8 color grid -> (N,4) XYZI voxel array."""
    x, y, z = np.nonzero(grid)
    return np.stack([x, y, z, grid[x, y, z]], axis=1).astype(np.uint8)


def make_castle_vox(size: int = 256) -> np.ndarray:
    """Dense color grid of the castle, vox orientation (z = up)."""
    g = np.zeros((size, size, size), dtype=np.uint8)
    x, y = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")

    # Terrain slab with a checker of two grasses and a moat ring.
    checker = ((x >> 3) + (y >> 3)) & 1
    ground = np.where(checker == 0, GRASS_A, GRASS_B).astype(np.uint8)
    for z in range(4):
        g[:, :, z] = ground
    cx = cy = size // 2
    d = np.maximum(np.abs(x - cx), np.abs(y - cy))
    moat = (d >= 104) & (d < 112)
    g[:, :, 3][moat] = WATER
    g[:, :, 2][moat] = WATER

    stone = np.where((x + y) & 1 == 0, STONE_A, STONE_B).astype(np.uint8)
    stone2 = np.where((x ^ y) & 2 == 0, STONE_B, STONE_C).astype(np.uint8)

    def wall_ring(lo, hi, thickness, z0, z1, mat):
        ring = ((d >= lo) & (d < lo + thickness)) & (np.maximum(np.abs(x - cx), np.abs(y - cy)) < hi)
        for z in range(z0, z1):
            g[:, :, z][ring] = mat[ring]

    # Outer curtain wall: |d - 96| < 3, height 4..40, crenellated top.
    wall = (d >= 93) & (d < 99)
    for z in range(4, 40):
        g[:, :, z][wall] = stone[wall]
    merlon = wall & (((x + y) >> 2) & 1 == 0)
    for z in range(40, 46):
        g[:, :, z][merlon] = stone[merlon]

    # Gate: carve an opening in the south wall.
    gate = (np.abs(x - cx) < 8) & (y < cy) & wall
    for z in range(4, 24):
        g[:, :, z][gate] = 0
    # Wooden gate posts.
    posts = (np.abs(np.abs(x - cx) - 8) < 2) & (y < cy) & wall
    for z in range(4, 26):
        g[:, :, z][posts] = WOOD

    # Corner towers: cylinders at the four wall corners.
    r2 = lambda px, py: (x - px) ** 2 + (y - py) ** 2
    for tx in (cx - 96, cx + 96):
        for ty in (cy - 96, cy + 96):
            body = r2(tx, ty) < 14 * 14
            for z in range(4, 64):
                g[:, :, z][body] = stone2[body]
            cap = r2(tx, ty) < 16 * 16
            for z in range(64, 68):
                g[:, :, z][cap] = stone[cap]
            # conical roof
            for z in range(68, 92):
                rr = max(1, 16 - (z - 66))
                cone = r2(tx, ty) < rr * rr
                g[:, :, z][cone] = ROOF
            spire = r2(tx, ty) < 2
            for z in range(92, 96):
                g[:, :, z][spire] = GOLD

    # Central keep: box with corner turrets and a roof.
    keep = (np.abs(x - cx) < 30) & (np.abs(y - cy) < 30)
    shell = keep & ~((np.abs(x - cx) < 24) & (np.abs(y - cy) < 24))
    for z in range(4, 80):
        g[:, :, z][shell] = stone[shell]
    for z in range(4, 10):  # solid base
        g[:, :, z][keep] = stone[keep]
    kmerlon = keep & ~((np.abs(x - cx) < 26) & (np.abs(y - cy) < 26)) & ((x ^ y) & 4 == 0)
    for z in range(80, 86):
        g[:, :, z][kmerlon] = stone[kmerlon]
    # Keep roof pyramid.
    for z in range(80, 108):
        half = max(1, 24 - (z - 80))
        roof = (np.abs(x - cx) < half) & (np.abs(y - cy) < half)
        g[:, :, z][roof] = ROOF

    # Windows in the keep (carve).
    win = shell & (((x - cx + 60) % 12 < 2) | ((y - cy + 60) % 12 < 2))
    for z in range(30, 36):
        g[:, :, z][win] = 0
    for z in range(54, 60):
        g[:, :, z][win] = 0
    return g


def make_teapot_vox(size: int = 64) -> np.ndarray:
    """Dense color grid of a stylised teapot, vox orientation (z = up)."""
    g = np.zeros((size, size, size), dtype=np.uint8)
    s = size
    xs = (np.arange(s) + 0.5) / s * 2 - 1  # [-1, 1)
    x, y, z = np.meshgrid(xs, xs, xs, indexing="ij")
    zc = z + 0.25  # body center below mid-height

    # Body: squashed superellipsoid.
    body = ((x / 0.62) ** 2 + (y / 0.62) ** 2) ** 1.2 + (zc / 0.48) ** 2 < 1.0
    # Hollow it slightly (open top).
    inner = ((x / 0.5) ** 2 + (y / 0.5) ** 2) ** 1.2 + ((zc - 0.12) / 0.4) ** 2 < 1.0
    body &= ~(inner & (zc > 0.25))
    # Lid + knob.
    lid = (x**2 + y**2 < 0.35**2) & (np.abs(zc - 0.45) < 0.06)
    knob = (x**2 + y**2 + (zc - 0.58) ** 2) < 0.09**2
    # Spout: bent cone along +x.
    sx = x - 0.45
    spout_axis = zc - 0.1 - 0.8 * np.maximum(sx, 0)
    spout = (sx > 0) & (sx < 0.5) & ((y**2 + spout_axis**2) < (0.11 - 0.12 * sx) ** 2)
    # Handle: torus segment in the xz plane at -x.
    hx = x + 0.62
    ring = (np.sqrt(hx**2 + zc**2) - 0.28) ** 2 + y**2 < 0.055**2
    handle = ring & (hx > -0.1)

    g[body] = STONE_A  # porcelain white-ish -> reuse stone
    g[spout | handle] = GOLD
    g[lid] = ROOF
    g[knob] = GOLD
    return g


def castle_scene_bytes() -> bytes:
    """Castle as a .vox file: one 256³ model, identity scene graph."""
    grid = make_castle_vox()
    model = vp.VoxModel(size=grid.shape, voxels=_grid_to_voxels(grid))
    scenes = {
        0: vp.TransformNode(child=1, name="root"),
        1: vp.GroupNode(children=[2]),
        2: vp.TransformNode(child=3, name="castle"),
        3: vp.ShapeNode(model_ids=[0]),
    }
    return vp.write_vox(vp.VoxFile(models=[model], palette=_palette(), scenes=scenes))


def teapot_scene_bytes() -> bytes:
    grid = make_teapot_vox()
    model = vp.VoxModel(size=grid.shape, voxels=_grid_to_voxels(grid))
    scenes = {
        0: vp.TransformNode(child=1, name="root"),
        1: vp.GroupNode(children=[2]),
        2: vp.TransformNode(child=3, name="teapot"),
        3: vp.ShapeNode(model_ids=[0]),
    }
    return vp.write_vox(vp.VoxFile(models=[model], palette=_palette(), scenes=scenes))


# ---------------------------------------------------------------------------
# Scene composition helpers (the canonical + stress workloads)
# ---------------------------------------------------------------------------

def add_teapot(vox_scene, offset=(60.0, 40.0, 0.0), name="teapot") -> int:
    """Append the procgen teapot as a new model + instance — the
    reference's canonical frame is castle + animated teapot
    (``examples/castle.rs:107-117``). Returns the new instance index."""
    from dust_tpu.vox.loader import VoxInstance, load_vox_scene

    tp = load_vox_scene(teapot_scene_bytes())
    base = max(vox_scene.geometries) + 1
    for mid, geo in tp.geometries.items():
        vox_scene.geometries[base + mid] = geo
    idx = None
    for inst in tp.instances:
        t = inst.transform.copy()
        t[:3, 3] += np.asarray(offset, np.float32)
        vox_scene.instances.append(
            VoxInstance(base + inst.model_id, t, name=name))
        idx = len(vox_scene.instances) - 1
    return idx


def teapot_motion(base_o2w: np.ndarray, inst_idx: int, frame: int,
                  rate: float = 1.0 / 30.0) -> np.ndarray:
    """Per-frame bob + spin transform update for one instance
    (``teapot_move_system``, ``examples/castle.rs:126-148``). Returns a
    copy of ``base_o2w`` with row ``inst_idx`` animated."""
    import math

    t = frame * rate
    o2w = base_o2w.copy()
    c, s = math.cos(t), math.sin(t)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    o2w[inst_idx, :3, :3] = rot @ base_o2w[inst_idx, :3, :3]
    o2w[inst_idx, :3, 3] = base_o2w[inst_idx, :3, 3] + np.asarray(
        [0.0, 5.0 * math.sin(t * 2.0), 0.0], np.float32)
    return o2w


def stress_scene(grid: int = 3, spacing: float = 280.0, teapots: int = 2):
    """Many-instance stress workload: a ``grid``×``grid`` floor of castle
    instances (ONE shared model) plus ``teapots`` teapot instances —
    exercises the TLAS-style batched trace the way an UnboundedRoot tile
    world does (instances sharing few models). ≥3M voxels at 3×3."""
    from dust_tpu.vox.loader import VoxInstance, load_vox_scene

    scene = load_vox_scene(castle_scene_bytes())
    base = scene.instances[0]
    scene.instances.clear()
    half = (grid - 1) / 2.0
    for gx in range(grid):
        for gz in range(grid):
            t = base.transform.copy()
            t[:3, 3] += np.asarray(
                [(gx - half) * spacing, 0.0, (gz - half) * spacing],
                np.float32)
            scene.instances.append(
                VoxInstance(base.model_id, t, name=f"castle_{gx}_{gz}"))
    anim = None
    for k in range(teapots):
        if k == 0:
            anim = add_teapot(scene, offset=(60.0, 40.0, 0.0),
                              name="teapot_0")
            tp_model = scene.instances[anim].model_id
        else:  # later teapots share the first one's model (instances >> models)
            t = scene.instances[anim].transform.copy()
            t[:3, 3] += np.asarray([70.0 * k, 10.0 * k, 40.0 * k], np.float32)
            scene.instances.append(
                VoxInstance(tp_model, t, name=f"teapot_{k}"))
            anim = len(scene.instances) - 1
    return scene, anim
