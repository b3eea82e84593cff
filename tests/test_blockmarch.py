"""Pallas blockwise march (ops/blockmarch.py) vs the XLA march: bit-exact.

Runs the kernel in interpreter mode on CPU (the same arithmetic the Mosaic
compiler lowers on TPU; TPU-vs-XLA parity is additionally checked by
tools/bench_blockmarch.py on hardware). Both paths run float32 — the kernel
is the f32 fast path; float64 golden exactness stays with the XLA march
(tests/test_golden.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from python_raytracer_tpu.models.default import build_default_scene, default_settings
from python_raytracer_tpu.ops.blockmarch import march_blockwise, pack_blocks
from python_raytracer_tpu.ops.camera import generate_rays, pixel_grid
from python_raytracer_tpu.ops.march import RayBatch, march
from python_raytracer_tpu.scene.compile import compile_scene


@pytest.fixture(scope="module")
def scene():
    st = default_settings().replace(exact=False, static=False)
    sc = build_default_scene(st)
    cam_pos = np.array(sc.player.cam_pos, np.float32)
    cam_rot = np.array(sc.player.cam_rot, np.float32)
    cs = compile_scene(sc, cam_pos=cam_pos)
    return st, cs, cam_pos, cam_rot


def _rays(st, cam_pos, cam_rot, n, key):
    dirs, detail = pixel_grid(st, jnp.float32)
    reps = -(-n // dirs.shape[0])
    dirs = jnp.tile(dirs, (reps, 1))[:n]
    detail = jnp.tile(detail, (reps,))[:n]
    u_dof = jax.random.uniform(key, (n, 2), jnp.float32)
    r = generate_rays(st, jnp.asarray(cam_pos, jnp.float32),
                      jnp.asarray(cam_rot, jnp.float32), dirs, detail, u_dof)
    return RayBatch(r.pos.astype(jnp.float32), r.vel.astype(jnp.float32),
                    r.life.astype(jnp.float32))


def _assert_same(ref, out, hits=True):
    assert bool(jnp.all(ref.color == out.color))
    assert bool(jnp.all(ref.energy == out.energy))
    assert bool(jnp.all(ref.step == out.step))
    assert bool(jnp.all(ref.bounces == out.bounces))
    if hits:
        assert bool(jnp.all(ref.hits.vid == out.hits.vid))
        assert bool(jnp.all(ref.hits.u == out.hits.u))
        assert bool(jnp.all(ref.hits.flip == out.hits.flip))
        assert bool(jnp.all(ref.hits.count == out.hits.count))


def test_blockmarch_bitexact_with_hits(scene):
    st, cs, cam_pos, cam_rot = scene
    key = jax.random.PRNGKey(3)
    rays = _rays(st, cam_pos, cam_rot, 2048, key)
    ref = march(st, cs.spec, cs.arrays, rays, key=key, background="sky",
                mode="while", programs_used=cs.programs_used, record_hits=16)
    out = march_blockwise(st, cs.spec, cs.arrays, rays, key=key,
                          background="sky", programs_used=cs.programs_used,
                          record_hits=16, interpret=True)
    _assert_same(ref, out)


def test_blockmarch_byte_planes_bitexact(scene):
    """bf16 byte-plane cell fetch (4 single-pass MXU lookups of 8-bit word
    chunks) must match the XLA march bit-for-bit incl. the hit tape."""
    st, cs, cam_pos, cam_rot = scene
    key = jax.random.PRNGKey(3)
    rays = _rays(st, cam_pos, cam_rot, 2048, key)
    ref = march(st, cs.spec, cs.arrays, rays, key=key, background="sky",
                mode="while", programs_used=cs.programs_used, record_hits=16)
    out = march_blockwise(st, cs.spec, cs.arrays, rays, key=key,
                          background="sky", programs_used=cs.programs_used,
                          record_hits=16, interpret=True, byte_planes=True)
    _assert_same(ref, out)


def test_blockmarch_group_coarse_bitexact(scene):
    """Per-group gated chunk-table lookup (group_coarse=True) must match
    the XLA march bit-for-bit incl. the hit tape."""
    st, cs, cam_pos, cam_rot = scene
    key = jax.random.PRNGKey(3)
    rays = _rays(st, cam_pos, cam_rot, 2048, key)
    ref = march(st, cs.spec, cs.arrays, rays, key=key, background="sky",
                mode="while", programs_used=cs.programs_used, record_hits=16)
    out = march_blockwise(st, cs.spec, cs.arrays, rays, key=key,
                          background="sky", programs_used=cs.programs_used,
                          record_hits=16, interpret=True, group_coarse=True,
                          byte_planes=True)
    _assert_same(ref, out)


def test_blockmarch_no_hits_nonaligned_n(scene):
    """n not a multiple of the tile width exercises the padding path."""
    st, cs, cam_pos, cam_rot = scene
    key = jax.random.PRNGKey(11)
    rays = _rays(st, cam_pos, cam_rot, 1500, key)
    ref = march(st, cs.spec, cs.arrays, rays, key=key, background="sky",
                mode="while", programs_used=cs.programs_used)
    out = march_blockwise(st, cs.spec, cs.arrays, rays, key=key,
                          background="sky", programs_used=cs.programs_used,
                          interpret=True)
    _assert_same(ref, out, hits=False)


def test_blockmarch_cleanup_covers_small_caps(scene):
    """Tiny episode/iteration caps leave stragglers; the XLA cleanup pass
    must finish them bit-exactly — exactness never depends on the caps."""
    st, cs, cam_pos, cam_rot = scene
    key = jax.random.PRNGKey(5)
    rays = _rays(st, cam_pos, cam_rot, 1024, key)
    ref = march(st, cs.spec, cs.arrays, rays, key=key, background="sky",
                mode="while", programs_used=cs.programs_used, record_hits=16)
    out = march_blockwise(st, cs.spec, cs.arrays, rays, key=key,
                          background="sky", programs_used=cs.programs_used,
                          record_hits=16, ep_cap=2, inner_cap=3,
                          interpret=True)
    _assert_same(ref, out)


def test_blockmarch_rejects_unsupported(scene):
    st, cs, cam_pos, cam_rot = scene
    rays = _rays(st, cam_pos, cam_rot, 256, jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        march_blockwise(st.replace(exact=True), cs.spec, cs.arrays, rays,
                        interpret=True)
    with pytest.raises(ValueError):
        march_blockwise(st, cs.spec, cs.arrays, rays,
                        programs_used=(0, 1), interpret=True)


def test_pack_blocks_roundtrip(scene):
    """blocks[c, lo, hi] / blocks[c, 32+lo, hi] reconstruct every cell word."""
    st, cs, cam_pos, cam_rot = scene
    spec = cs.spec
    blocks, coarse = pack_blocks(spec, cs.arrays.cell_word, cs.arrays.chunk_res)
    cw = np.asarray(cs.arrays.cell_word).reshape(spec.shape)
    b = np.asarray(blocks)
    rng = np.random.default_rng(0)
    CX, CY, CZ = spec.chunk_shape
    for _ in range(200):
        x, y, z = (int(rng.integers(0, s)) for s in spec.shape)
        c = (x % 16 * 16 + y % 16) * 16 + z % 16
        page = ((x // 16) * CY + y // 16) * CZ + z // 16
        lo, hi = c & 31, c >> 5
        word = int(b[page, lo, hi]) | (int(b[page, 32 + lo, hi]) << 16)
        assert word == int(cw[x, y, z])
        cpl = np.asarray(coarse.astype('float32'))
        cword = (int(cpl[0, z // 16, (x // 16) * CY + y // 16])
                 | (int(cpl[1, z // 16, (x // 16) * CY + y // 16]) << 8))
        assert cword >> 3 == page
        assert cword & 7 == int(np.asarray(cs.arrays.chunk_res)[page])


def test_blockmarch_diff_grads_match_while(scene):
    """make_diff_renderer(forward='block') must produce the same gradients
    as the while-march forward (the hit tape is bit-identical, so the
    hit-replay backward sees identical inputs)."""
    import dataclasses

    from python_raytracer_tpu.ops import blockmarch as B
    from python_raytracer_tpu.ops.diff import make_diff_renderer

    st, cs, cam_pos, cam_rot = scene
    key = jax.random.PRNGKey(9)
    rays = _rays(st, cam_pos, cam_rot, 1024, key)

    # interpret mode for the kernel on CPU
    orig = B.march_blockwise

    def interp(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    B.march_blockwise = interp
    try:
        r_block = make_diff_renderer(st, cs.spec, max_hits=16,
                                     programs_used=cs.programs_used,
                                     forward="block")
        r_while = make_diff_renderer(st, cs.spec, max_hits=16,
                                     programs_used=cs.programs_used,
                                     forward="while")

        def loss(renderer, table):
            color, _ = renderer(table, cs.arrays, rays, key)
            return jnp.mean(color / 255.0)

        table = cs.arrays.material_table
        g_block = jax.grad(lambda t: loss(r_block, t))(table)
        g_while = jax.grad(lambda t: loss(r_while, t))(table)
        np.testing.assert_array_equal(np.asarray(g_block), np.asarray(g_while))
    finally:
        B.march_blockwise = orig


def test_blockmarch_supersteps_unroll_exact(scene):
    """Mid-march compaction supersteps + inner unroll stay bit-exact."""
    st, cs, cam_pos, cam_rot = scene
    key = jax.random.PRNGKey(21)
    rays = _rays(st, cam_pos, cam_rot, 2048, key)
    ref = march(st, cs.spec, cs.arrays, rays, key=key, background="sky",
                mode="while", programs_used=cs.programs_used, record_hits=16)
    out = march_blockwise(st, cs.spec, cs.arrays, rays, key=key,
                          background="sky", programs_used=cs.programs_used,
                          record_hits=16, supersteps=3, ep_cap=4,
                          inner_cap=10, unroll=2, interpret=True)
    _assert_same(ref, out)


def test_blockmarch_traversed_matches(scene):
    """In-kernel traversed-chunk feedback (culling loop input) must equal
    the XLA march's recording."""
    st, cs, cam_pos, cam_rot = scene
    key = jax.random.PRNGKey(31)
    rays = _rays(st, cam_pos, cam_rot, 1024, key)
    ref = march(st, cs.spec, cs.arrays, rays, key=key, background="sky",
                mode="while", programs_used=cs.programs_used,
                record_traversed=True)
    out = march_blockwise(st, cs.spec, cs.arrays, rays, key=key,
                          background="sky", programs_used=cs.programs_used,
                          record_traversed=True, supersteps=2, ep_cap=8,
                          interpret=True)
    _assert_same(ref, out, hits=False)
    np.testing.assert_array_equal(np.asarray(ref.traversed),
                                  np.asarray(out.traversed))


def test_render_frame_block_falls_back_gracefully(scene):
    """mode="block" with a config the kernel cannot serve (custom material
    programs) must render through the XLA march, not raise."""
    from python_raytracer_tpu.ops import programs as P
    from python_raytracer_tpu.ops.render import render_frame

    pid = P.register_program("blocktest_flat",
                             lambda ray, mat, settings, u: ({}, mat.absorption))
    st, cs, cam_pos, cam_rot = scene
    key = jax.random.PRNGKey(2)
    img_b, _ = render_frame(st, cs.spec, cs.arrays, cam_pos, cam_rot,
                            key=key, mode="block",
                            programs_used=(0, pid))  # kernel: PBR-only
    img_w, _ = render_frame(st, cs.spec, cs.arrays, cam_pos, cam_rot,
                            key=key, mode="while", programs_used=(0, pid))
    np.testing.assert_array_equal(np.asarray(img_b), np.asarray(img_w))


def test_engine_block_frames_match():
    """Engine(block=True) frames equal Engine() frames (f32, key RNG, full
    culling-feedback loop through the in-kernel traversed recording)."""
    from python_raytracer_tpu.models.default import build_default_scene, default_settings
    from python_raytracer_tpu.ops import blockmarch as B
    from python_raytracer_tpu.runtime.engine import Engine

    st = default_settings().replace(width=16, height=12, samples=1,
                                    gravity=0.0, dof=0.0, lod_random=0.0,
                                    static=False, exact=False)

    orig = B.march_blockwise

    def interp(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    B.march_blockwise = interp
    try:
        e_ref = Engine(build_default_scene(st), pipeline=False)
        e_blk = Engine(build_default_scene(st), pipeline=False, block=True)
        # resident pool under the Engine's jitted renderer (traced scene
        # arrays -> capacity-bounded pool; colors may differ in the last
        # ULP from jit fusion of the interpret ops, so compare allclose)
        e_res = Engine(build_default_scene(st), pipeline=False, block=True,
                       block_kw={"resident": True, "inner_cap": 2,
                                 "ep_cap": 256})
        for fi in range(4):
            a = e_ref.step(1 / 24)
            b = e_blk.step(1 / 24)
            c = e_res.step(1 / 24)
            np.testing.assert_array_equal(a, b, err_msg=f"frame {fi}")
            np.testing.assert_array_equal(np.asarray(e_ref._traversed),
                                          np.asarray(e_blk._traversed))
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       atol=1e-3, err_msg=f"frame {fi}")
            np.testing.assert_array_equal(np.asarray(e_ref._traversed),
                                          np.asarray(e_res._traversed))
    finally:
        B.march_blockwise = orig


@pytest.mark.parametrize("seed", [0, 7, 11])
def test_blockmarch_random_scenes(seed, tmp_path):
    """Kernel vs XLA march on RANDOMIZED scenes (tools/differential.py
    generator): coverage beyond the default castle — random materials,
    IOR classes, roughness flags, rotations, sprite LODs."""
    import os
    import sys

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from differential import gen_mod

    from python_raytracer_tpu.modapi import load_mod
    from python_raytracer_tpu.scene.compile import compile_scene as _compile

    root = str(tmp_path)
    gen_mod(seed, os.path.join(root, "mods", f"rand{seed}"))
    scene = load_mod(f"rand{seed}", mods_root=os.path.join(root, "mods"))
    st = scene.settings.replace(exact=False, static=False)
    scene.settings = st
    cam_pos = np.array(scene.player.cam_pos, np.float32)
    cam_rot = np.array(scene.player.cam_rot, np.float32)
    cs = _compile(scene, cam_pos=cam_pos)
    if tuple(cs.programs_used) != (0,):
        pytest.skip("kernel falls back to XLA for multi-program scenes")

    key = jax.random.PRNGKey(seed)
    rays = _rays(st, cam_pos, cam_rot, 1024, key)
    ref = march(st, cs.spec, cs.arrays, rays, key=key, background="sky",
                mode="while", programs_used=cs.programs_used, record_hits=16)
    out = march_blockwise(st, cs.spec, cs.arrays, rays, key=key,
                          background="sky", programs_used=cs.programs_used,
                          record_hits=16, interpret=True)
    _assert_same(ref, out)


def test_blockmarch_tape_mode_bitexact(scene):
    """Static-noise (tape) mode: the kernel consumes per-ray VMEM-staged
    Mersenne-Twister tape segments in the reference's exact draw order
    (utils/tape.py) — bit-exact vs march(tape=...) incl. the hit tape.
    This is the stock reference config's path (static=true,
    init.py:136-137), VERDICT round-2 item 5."""
    st, cs, cam_pos, cam_rot = scene
    key = jax.random.PRNGKey(3)
    rays = _rays(st, cam_pos, cam_rot, 2048, key)
    n = 2048
    tape = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(77), (n, 75), jnp.float32))
    ptr0 = jnp.full((n,), 3, jnp.int32)  # after u_lod + 2 DOF raygen draws
    ref = march(st, cs.spec, cs.arrays, rays, tape=jnp.asarray(tape),
                tape_ptr=ptr0, background="sky", mode="while",
                programs_used=cs.programs_used, record_hits=16)
    out = march_blockwise(st, cs.spec, cs.arrays, rays, key=key,
                          tape=jnp.asarray(tape), tape_ptr=ptr0,
                          background="sky", programs_used=cs.programs_used,
                          record_hits=16, interpret=True)
    _assert_same(ref, out)


def test_blockmarch_tape_mode_supersteps_small_caps(scene):
    """Tape mode under compaction re-sorts and cap-straggler cleanup: the
    tape pointer and per-lane segments must survive the co-sorts and the
    XLA cleanup must continue consuming the same tape."""
    st, cs, cam_pos, cam_rot = scene
    key = jax.random.PRNGKey(13)
    rays = _rays(st, cam_pos, cam_rot, 1024, key)
    n = 1024
    tape = jax.random.uniform(jax.random.PRNGKey(5), (n, 75), jnp.float32)
    ptr0 = jnp.full((n,), 1, jnp.int32)  # dof=0 raygen consumes only u_lod
    ref = march(st, cs.spec, cs.arrays, rays, tape=tape, tape_ptr=ptr0,
                background="sky", mode="while",
                programs_used=cs.programs_used, record_hits=16)
    out = march_blockwise(st, cs.spec, cs.arrays, rays, key=key, tape=tape,
                          tape_ptr=ptr0, background="sky",
                          programs_used=cs.programs_used, record_hits=16,
                          supersteps=3, ep_cap=3, inner_cap=6,
                          interpret=True)
    _assert_same(ref, out)


def test_engine_block_static_frames_match():
    """Engine(block=True) on a STATIC config (the stock reference default,
    config.cfg static=true) renders through the kernel's tape mode and must
    equal the XLA engine frame-for-frame."""
    from python_raytracer_tpu.models.default import build_default_scene, default_settings
    from python_raytracer_tpu.ops import blockmarch as B
    from python_raytracer_tpu.runtime.engine import Engine

    st = default_settings().replace(width=16, height=12, samples=1,
                                    gravity=0.0, static=True, exact=False)

    orig = B.march_blockwise

    def interp(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    B.march_blockwise = interp
    try:
        e_ref = Engine(build_default_scene(st), pipeline=False)
        e_blk = Engine(build_default_scene(st), pipeline=False, block=True)
        for fi in range(3):
            a = e_ref.step(1 / 24)
            b = e_blk.step(1 / 24)
            np.testing.assert_array_equal(a, b, err_msg=f"frame {fi}")
    finally:
        B.march_blockwise = orig


def test_blockmarch_voxel_albedo_bitexact(scene):
    """Per-voxel albedo grid through the kernel: the offsets ride the chunk
    pages (pack_blocks 160-row blocks), the hit cells land in the packed
    tape, and everything is bit-exact vs the XLA march (VERDICT r2 item 7)."""
    st, cs, cam_pos, cam_rot = scene
    key = jax.random.PRNGKey(3)
    rays = _rays(st, cam_pos, cam_rot, 1024, key)
    nv = int(np.prod(cs.spec.shape))
    vox = (jax.random.uniform(jax.random.PRNGKey(123), (nv, 3), jnp.float32)
           * 20.0 - 10.0)
    ref = march(st, cs.spec, cs.arrays, rays, key=key, background="sky",
                mode="while", programs_used=cs.programs_used, record_hits=16,
                voxel_albedo=vox, record_cells=True)
    out = march_blockwise(st, cs.spec, cs.arrays, rays, key=key,
                          background="sky", programs_used=cs.programs_used,
                          record_hits=16, voxel_albedo=vox, record_cells=True,
                          supersteps=2, ep_cap=6, inner_cap=8,
                          interpret=True)
    _assert_same(ref, out)
    np.testing.assert_array_equal(np.asarray(ref.hits.cell),
                                  np.asarray(out.hits.cell))


@pytest.mark.parametrize("block_kw", [
    dict(),
    dict(byte_planes=True, resident=True, inner_cap=2, ep_cap=192),
], ids=["paged-f32", "resident-byte-planes"])
def test_voxel_grid_gradients_block_forward(scene, block_kw):
    """make_diff_renderer(voxel_grid=True, forward='block'): per-voxel grid
    gradients at kernel speed equal the while-forward gradients exactly —
    including on the PRODUCTION kernel configuration (byte planes +
    resident pool, VERDICT r4 item 7): trajectories are albedo-free, so
    the kernel records hit cells and the replay reconstructs the exact
    albedo-shifted colors from the tape (ops/diff.py)."""
    from python_raytracer_tpu.ops import blockmarch as B
    from python_raytracer_tpu.ops.diff import make_diff_renderer

    st, cs, cam_pos, cam_rot = scene
    key = jax.random.PRNGKey(9)
    rays = _rays(st, cam_pos, cam_rot, 512, key)
    nv = int(np.prod(cs.spec.shape))
    vox0 = jnp.zeros((nv, 3), jnp.float32)

    orig = B.march_blockwise

    def interp(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    B.march_blockwise = interp
    try:
        r_block = make_diff_renderer(st, cs.spec, max_hits=16,
                                     programs_used=cs.programs_used,
                                     forward="block", voxel_grid=True,
                                     block_kw=block_kw)
        r_while = make_diff_renderer(st, cs.spec, max_hits=16,
                                     programs_used=cs.programs_used,
                                     forward="while", voxel_grid=True)

        def loss(renderer, table, vox):
            color, _ = renderer(table, vox, cs.arrays, rays, key)
            return jnp.mean(color / 255.0)

        table = cs.arrays.material_table
        (gt_b, gv_b) = jax.grad(lambda t, v: loss(r_block, t, v),
                                argnums=(0, 1))(table, vox0)
        (gt_w, gv_w) = jax.grad(lambda t, v: loss(r_while, t, v),
                                argnums=(0, 1))(table, vox0)
        np.testing.assert_array_equal(np.asarray(gt_b), np.asarray(gt_w))
        np.testing.assert_array_equal(np.asarray(gv_b), np.asarray(gv_w))
        assert np.abs(np.asarray(gv_b)).sum() > 0

        # forward effect: a NONZERO albedo grid renders bit-identically to
        # the while forward (which applies offsets inside the march)
        hit_cells = np.unique(np.asarray(
            orig(st, cs.spec, cs.arrays, rays, key=key, background="sky",
                 programs_used=cs.programs_used, record_hits=16,
                 record_cells=True, interpret=True).hits.cell))
        voxb = vox0.at[jnp.asarray(hit_cells)].set(
            jnp.asarray([40.0, -20.0, 10.0], jnp.float32))
        cb, eb = r_block(table, voxb, cs.arrays, rays, key)
        cw, ew = r_while(table, voxb, cs.arrays, rays, key)
        np.testing.assert_array_equal(np.asarray(cb), np.asarray(cw))
        np.testing.assert_array_equal(np.asarray(eb), np.asarray(ew))
        assert float(jnp.abs(cb - r_while(table, vox0, cs.arrays, rays,
                                          key)[0]).max()) > 0
    finally:
        B.march_blockwise = orig


def test_blockmarch_pages_bitexact(scene):
    """Multi-page VMEM residency (pages=2): diverged groups keep two chunk
    blocks live and fewer lanes freeze per episode — same results to the
    bit, incl. the hit tape (the kernel's freeze/resume order is already
    proven order-independent; this checks the slot-masked accumulation)."""
    st, cs, cam_pos, cam_rot = scene
    key = jax.random.PRNGKey(3)
    rays = _rays(st, cam_pos, cam_rot, 2048, key)
    ref = march(st, cs.spec, cs.arrays, rays, key=key, background="sky",
                mode="while", programs_used=cs.programs_used, record_hits=16)
    out = march_blockwise(st, cs.spec, cs.arrays, rays, key=key,
                          background="sky", programs_used=cs.programs_used,
                          record_hits=16, pages=2, ep_cap=6, inner_cap=8,
                          supersteps=2, interpret=True)
    _assert_same(ref, out)


def test_blockmarch_pages_byte_planes_bitexact(scene):
    st, cs, cam_pos, cam_rot = scene
    key = jax.random.PRNGKey(5)
    rays = _rays(st, cam_pos, cam_rot, 1024, key)
    ref = march(st, cs.spec, cs.arrays, rays, key=key, background="sky",
                mode="while", programs_used=cs.programs_used, record_hits=16)
    out = march_blockwise(st, cs.spec, cs.arrays, rays, key=key,
                          background="sky", programs_used=cs.programs_used,
                          record_hits=16, pages=3, byte_planes=True,
                          ep_cap=5, inner_cap=6, interpret=True)
    _assert_same(ref, out)


def test_blockmarch_resort_life_bitexact(scene):
    """Remaining-life superstep re-sort key: pure scheduling change, results
    identical to the bit."""
    st, cs, cam_pos, cam_rot = scene
    key = jax.random.PRNGKey(7)
    rays = _rays(st, cam_pos, cam_rot, 2048, key)
    ref = march(st, cs.spec, cs.arrays, rays, key=key, background="sky",
                mode="while", programs_used=cs.programs_used, record_hits=16)
    out = march_blockwise(st, cs.spec, cs.arrays, rays, key=key,
                          background="sky", programs_used=cs.programs_used,
                          record_hits=16, supersteps=3, resort_life=True,
                          ep_cap=4, inner_cap=6, interpret=True)
    _assert_same(ref, out)


def test_blockmarch_resident_bitexact(scene):
    """VMEM-resident pool mode (no vote+DMA episodes): the whole occupied
    scene rides in VMEM and any page is servable per vote — bit-exact incl.
    the hit tape across serve-window (inner_cap) choices and byte planes."""
    st, cs, cam_pos, cam_rot = scene
    key = jax.random.PRNGKey(3)
    rays = _rays(st, cam_pos, cam_rot, 2048, key)
    ref = march(st, cs.spec, cs.arrays, rays, key=key, background="sky",
                mode="while", programs_used=cs.programs_used, record_hits=16)
    for kw in (dict(inner_cap=1, ep_cap=512),
               dict(inner_cap=4, ep_cap=128, byte_planes=True),
               dict(inner_cap=2, ep_cap=64, supersteps=2,
                    resort_life=True)):
        out = march_blockwise(st, cs.spec, cs.arrays, rays, key=key,
                              background="sky",
                              programs_used=cs.programs_used,
                              record_hits=16, resident=True,
                              interpret=True, **kw)
        _assert_same(ref, out)


def test_blockmarch_resident_tape_mode(scene):
    """Resident mode under the static-noise tape (reference stock config)."""
    st, cs, cam_pos, cam_rot = scene
    key = jax.random.PRNGKey(9)
    n = 512
    rays = _rays(st, cam_pos, cam_rot, n, key)
    tape = jnp.asarray(np.asarray(
        jax.random.uniform(jax.random.PRNGKey(77), (n, 75), jnp.float32)))
    ptr0 = jnp.full((n,), 3, jnp.int32)
    ref = march(st, cs.spec, cs.arrays, rays, tape=tape, tape_ptr=ptr0,
                background="sky", mode="while",
                programs_used=cs.programs_used, record_hits=16)
    out = march_blockwise(st, cs.spec, cs.arrays, rays, key=key, tape=tape,
                          tape_ptr=ptr0, background="sky",
                          programs_used=cs.programs_used,
                          record_hits=16, resident=True, inner_cap=2,
                          ep_cap=256, interpret=True)
    _assert_same(ref, out)


def _tint_program(ray, mat, settings, draws):
    """Two-program test shader ([N,3] ABI): bounce-falloff albedo blend with
    an additive half-energy kick and half-absorption bounce weight."""
    absb = jnp.minimum(1.0, mat.absorption / (1.0 + ray.bounces))
    color = ray.color * (1 - absb[:, None]) + mat.albedo * absb[:, None]
    energy = ray.energy + mat.energy * 0.5
    return {"color": color, "energy": energy}, mat.absorption * 0.5


def _tint_rows(ray, mat, settings, draws):
    """Lane-major twin of _tint_program (same float expressions)."""
    absb = jnp.minimum(1.0, mat.absorption / (1.0 + ray.bounces))
    color = tuple(c * (1 - absb) + a * absb
                  for c, a in zip(ray.color, mat.albedo))
    energy = ray.energy + mat.energy * 0.5
    return {"color": color, "energy": energy}, mat.absorption * 0.5


def test_blockmarch_multi_program_bitexact():
    """A two-program scene (builtin PBR + registered custom program with a
    lane-major variant) marches through the kernel's masked multi-program
    dispatch bit-exactly vs the XLA march (VERDICT r3 item 6; the ABI's
    per-hit dispatch is reference init.py:81)."""
    from python_raytracer_tpu.config import Settings
    from python_raytracer_tpu.ops import programs as P
    from python_raytracer_tpu.ops.blockmarch import blockmarch_supported
    from python_raytracer_tpu.scene import Material, Object, Scene, Sprite

    pid = P.register_program("tint_rows_test", _tint_program,
                             rows_fn=_tint_rows)
    try:
        st = Settings(width=16, height=16, chunk_size=16, dist_max=48,
                      max_light=10, max_bounces=2, exact=False, static=False)
        scene = Scene(st)
        with scene:
            pbr = Material(albedo=(200, 40, 40), roughness=0.4,
                           absorption=0.75, ior=0, energy=0, solidity=1)
            tint = Material(albedo=(10, 250, 10), roughness=0,
                            absorption=0.5, ior=0, energy=1.0, solidity=1,
                            function="tint_rows_test")
            spr = Sprite(size=(16, 16, 16), frames=1)
            vox = {}
            for x in range(16):
                for y in range(16):
                    for z in range(2):
                        vox[(x, y, z)] = pbr if (x + y) % 2 else tint
            spr.get_frame(0).set_voxels(vox, True)
            obj = Object(pos=(-8, -8, 10))
            obj.set_sprite(spr)
        cs = compile_scene(scene, cam_pos=np.zeros(3))
        assert len(cs.programs_used) == 2 and pid in cs.programs_used
        assert blockmarch_supported(st, cs.spec, cs.programs_used)
        key = jax.random.PRNGKey(21)
        rays = _rays(st, np.zeros(3, np.float32),
                     np.array([0, 0, 0, 1], np.float32), 512, key)
        ref = march(st, cs.spec, cs.arrays, rays, key=key, background="sky",
                    mode="while", programs_used=cs.programs_used,
                    record_hits=12)
        for kw in (dict(), dict(resident=True, inner_cap=2, ep_cap=128),
                   dict(byte_planes=True)):
            out = march_blockwise(st, cs.spec, cs.arrays, rays, key=key,
                                  background="sky",
                                  programs_used=cs.programs_used,
                                  record_hits=12, tile=512, interpret=True,
                                  **kw)
            _assert_same(ref, out)
        # both materials must actually be hit for the dispatch to be tested
        vids = np.asarray(ref.hits.vid)
        hit_mats = set(vids[vids > 0].tolist())
        assert len(hit_mats) >= 2
    finally:
        P._PROGRAMS.pop(pid, None)
        P._PROGRAM_ROWS.pop(pid, None)
        P._PROGRAM_NAMES.pop("tint_rows_test", None)


def test_blockmarch_resident_traced_grid_and_overflow(scene):
    """Resident mode under jit with TRACED scene arrays (the Engine path):
    fixed-capacity pool + data-dependent page map. With capacity below the
    occupied-chunk count, overflow chunks' rays freeze and the cleanup
    finishes them — bit-exact either way."""
    st, cs, cam_pos, cam_rot = scene
    key = jax.random.PRNGKey(3)
    rays = _rays(st, cam_pos, cam_rot, 1024, key)
    ref = march(st, cs.spec, cs.arrays, rays, key=key, background="sky",
                mode="while", programs_used=cs.programs_used, record_hits=16)
    n_occ = int((np.asarray(cs.arrays.chunk_res) > 0).sum())

    def run(arrays, cap):
        return march_blockwise(st, cs.spec, arrays, rays, key=key,
                               background="sky",
                               programs_used=cs.programs_used,
                               record_hits=16, resident=True,
                               resident_cap=cap, inner_cap=2, ep_cap=128,
                               interpret=True)

    def assert_same_traj(ref, out):
        # trajectories must be exact; final colors may differ in the last
        # ULP because the enclosing jit FUSES the interpret-mode shading
        # chain (FMA rounding) — the same comparison rule as the hardware
        # check (tools/tpu_checks.py). Verified: step/vid/count/u all exact.
        assert bool(jnp.all(ref.step == out.step))
        assert bool(jnp.all(ref.bounces == out.bounces))
        assert bool(jnp.all(ref.hits.vid == out.hits.vid))
        assert bool(jnp.all(ref.hits.u == out.hits.u))
        assert bool(jnp.all(ref.hits.flip == out.hits.flip))
        assert bool(jnp.all(ref.hits.count == out.hits.count))
        np.testing.assert_allclose(np.asarray(ref.color),
                                   np.asarray(out.color), atol=1e-3)

    # ample capacity (traced grid)
    out = jax.jit(lambda a: run(a, n_occ + 7))(cs.arrays)
    assert_same_traj(ref, out)
    # overflow: half the occupied chunks don't fit the pool
    out2 = jax.jit(lambda a: run(a, max(1, n_occ // 2)))(cs.arrays)
    assert_same_traj(ref, out2)


def test_blockmarch_unsorted_split_mode(scene):
    """Split-program mode (bench.py): kernel-order outputs + slot
    permutation + sorted initial velocities; a host unsort must reproduce
    the fused path bit-for-bit, and the resumed cleanup march must continue
    the permuted state exactly."""
    st, cs, cam_pos, cam_rot = scene
    key = jax.random.PRNGKey(3)
    rays = _rays(st, cam_pos, cam_rot, 1024, key)
    ref = march(st, cs.spec, cs.arrays, rays, key=key, background="sky",
                mode="while", programs_used=cs.programs_used, record_hits=16)
    _, state_u, sid_s, vel0 = march_blockwise(
        st, cs.spec, cs.arrays, rays, key=key, background="sky",
        programs_used=cs.programs_used, record_hits=16, tile=512,
        resident=True, inner_cap=4, ep_cap=192, byte_planes=True,
        cleanup=False, finalize=False, unsorted=True, return_perm=True,
        interpret=True)
    res2 = march(st, cs.spec, cs.arrays,
                 RayBatch(state_u.pos, state_u.vel, state_u.life),
                 key=key, background="sky", mode="while",
                 programs_used=cs.programs_used, record_hits=16,
                 resume_state=state_u)
    sid = np.asarray(sid_s)
    inv = np.argsort(sid)
    np.testing.assert_array_equal(np.asarray(vel0),
                                  np.asarray(rays.vel)[sid])
    np.testing.assert_array_equal(np.asarray(res2.color)[inv],
                                  np.asarray(ref.color))
    np.testing.assert_array_equal(np.asarray(res2.step)[inv],
                                  np.asarray(ref.step))
    np.testing.assert_array_equal(np.asarray(res2.hits.vid)[inv],
                                  np.asarray(ref.hits.vid))
    np.testing.assert_array_equal(np.asarray(res2.hits.u)[inv],
                                  np.asarray(ref.hits.u))
    np.testing.assert_array_equal(np.asarray(res2.hits.count)[inv],
                                  np.asarray(ref.hits.count))


def test_blockmarch_capped_resume_compact(scene):
    """Cap-and-cleanup forward (round-5 trip-imbalance lever): a hard
    trip-capped kernel leaves many survivors mid-flight; resume_compact
    gathers them to a static-width batch, marches it to completion and
    scatters back; the full-batch backstop then finishes anyone a too-small
    width missed. Bit-exact vs the plain march for BOTH a covering width
    and a deliberately under-provisioned one (exactness must never depend
    on the width — CLAUDE.md golden rule)."""
    from python_raytracer_tpu.ops.compact import resume_compact
    st, cs, cam_pos, cam_rot = scene
    key = jax.random.PRNGKey(3)
    rays = _rays(st, cam_pos, cam_rot, 1024, key)
    ref = march(st, cs.spec, cs.arrays, rays, key=key, background="sky",
                mode="while", programs_used=cs.programs_used, record_hits=16)
    _, state_u, sid_s, _ = march_blockwise(
        st, cs.spec, cs.arrays, rays, key=key, background="sky",
        programs_used=cs.programs_used, record_hits=16, tile=512,
        resident=True, inner_cap=2, ep_cap=4, byte_planes=True,
        cleanup=False, finalize=False, unsorted=True, return_perm=True,
        interpret=True)
    n_alive = int(np.asarray(state_u.alive).sum())
    assert n_alive > 8, "cap too loose for the test to mean anything"
    inv = np.argsort(np.asarray(sid_s))
    for width in (512, 8):  # covering / deliberately too small
        state = resume_compact(
            st, cs.spec, cs.arrays, state_u, key=key,
            programs_used=cs.programs_used, background="sky",
            record_hits=16, width=width)
        if width >= n_alive:
            assert not bool(np.asarray(state.alive).any())
        else:
            assert bool(np.asarray(state.alive).any())
        res2 = march(st, cs.spec, cs.arrays,
                     RayBatch(state.pos, state.vel, state.life),
                     key=key, background="sky", mode="while",
                     programs_used=cs.programs_used, record_hits=16,
                     resume_state=state)
        np.testing.assert_array_equal(np.asarray(res2.color)[inv],
                                      np.asarray(ref.color))
        np.testing.assert_array_equal(np.asarray(res2.step)[inv],
                                      np.asarray(ref.step))
        np.testing.assert_array_equal(np.asarray(res2.hits.vid)[inv],
                                      np.asarray(ref.hits.vid))
        np.testing.assert_array_equal(np.asarray(res2.hits.u)[inv],
                                      np.asarray(ref.hits.u))
        np.testing.assert_array_equal(np.asarray(res2.hits.count)[inv],
                                      np.asarray(ref.hits.count))
    # integrated path: march_blockwise(cleanup_width=...) — the fused
    # kernel + compacted cleanup + backstop in one call (the Engine path)
    res3 = march_blockwise(
        st, cs.spec, cs.arrays, rays, key=key, background="sky",
        programs_used=cs.programs_used, record_hits=16, tile=512,
        resident=True, inner_cap=2, ep_cap=4, byte_planes=True,
        cleanup_width=256, interpret=True)
    np.testing.assert_array_equal(np.asarray(res3.color),
                                  np.asarray(ref.color))
    np.testing.assert_array_equal(np.asarray(res3.hits.u),
                                  np.asarray(ref.hits.u))


def _heat_program(ray, mat, settings, draws):
    """Custom-ray-property test shader ([N,3] ABI): accumulates mat.energy
    into a registered 'heat' row and tints color by it (the reference's
    mutable ray-store fields, README.md:96)."""
    heat = ray.aux["heat"] + mat.energy
    absb = jnp.minimum(1.0, mat.absorption / (1.0 + ray.bounces))
    color = (ray.color * (1 - absb[:, None])
             + (mat.albedo + heat[:, None]) * absb[:, None])
    return {"color": color, "heat": heat}, mat.absorption


def _heat_rows(ray, mat, settings, draws):
    """Lane-major twin of _heat_program (same float expressions)."""
    heat = ray.aux["heat"] + mat.energy
    absb = jnp.minimum(1.0, mat.absorption / (1.0 + ray.bounces))
    color = tuple(c * (1 - absb) + (a + heat) * absb
                  for c, a in zip(ray.color, mat.albedo))
    return {"color": color, "heat": heat}, mat.absorption


def test_blockmarch_ray_property_bitexact():
    """Registered custom ray properties ride the kernel state as extra
    lane-major rows (VERDICT r4 item 4): a scene whose program reads and
    writes ray.aux marches through the kernel bit-exactly vs the XLA march,
    including the returned aux rows and the hit tape — across the plain,
    resident and byte-plane kernels and a superstep re-sort."""
    from python_raytracer_tpu.config import Settings
    from python_raytracer_tpu.ops import programs as P
    from python_raytracer_tpu.ops.blockmarch import blockmarch_supported
    from python_raytracer_tpu.scene import Material, Object, Scene, Sprite

    P.register_ray_property("heat", init=0.25)
    pid = P.register_program("heat_rows_test", _heat_program,
                             rows_fn=_heat_rows)
    try:
        st = Settings(width=16, height=16, chunk_size=16, dist_max=48,
                      max_light=10, max_bounces=3, exact=False, static=False)
        scene = Scene(st)
        with scene:
            pbr = Material(albedo=(200, 40, 40), roughness=0.4,
                           absorption=0.75, ior=0, energy=0, solidity=1)
            hot = Material(albedo=(10, 250, 10), roughness=0,
                           absorption=0.5, ior=0, energy=1.0, solidity=1,
                           function="heat_rows_test")
            spr = Sprite(size=(16, 16, 16), frames=1)
            vox = {}
            for x in range(16):
                for y in range(16):
                    for z in range(2):
                        vox[(x, y, z)] = pbr if (x + y) % 2 else hot
            spr.get_frame(0).set_voxels(vox, True)
            obj = Object(pos=(-8, -8, 10))
            obj.set_sprite(spr)
        cs = compile_scene(scene, cam_pos=np.zeros(3))
        assert blockmarch_supported(st, cs.spec, cs.programs_used)
        key = jax.random.PRNGKey(21)
        rays = _rays(st, np.zeros(3, np.float32),
                     np.array([0, 0, 0, 1], np.float32), 512, key)
        ref = march(st, cs.spec, cs.arrays, rays, key=key, background="sky",
                    mode="while", programs_used=cs.programs_used,
                    record_hits=12)
        assert float(np.asarray(ref.aux["heat"]).max()) > 0.25
        for kw in (dict(), dict(resident=True, inner_cap=2, ep_cap=128),
                   dict(byte_planes=True),
                   dict(supersteps=2, ep_cap=8, inner_cap=4)):
            out = march_blockwise(st, cs.spec, cs.arrays, rays, key=key,
                                  background="sky",
                                  programs_used=cs.programs_used,
                                  record_hits=12, tile=512, interpret=True,
                                  **kw)
            _assert_same(ref, out)
            np.testing.assert_array_equal(np.asarray(out.aux["heat"]),
                                          np.asarray(ref.aux["heat"]))
    finally:
        P.unregister_ray_property("heat")
        P._PROGRAMS.pop(pid, None)
        P._PROGRAM_ROWS.pop(pid, None)
        P._PROGRAM_NAMES.pop("heat_rows_test", None)


def test_blockmarch_resident_heat_pool_overflow(scene):
    """Beyond-VMEM scenes on the resident kernel (VERDICT r4 item 6): a
    static resident_cap SMALLER than the occupied-chunk count, with the
    pool heat-ordered by distance to ``pool_center`` — hot chunks march
    in-kernel, cold-chunk lanes freeze (unservable page) and the XLA
    cleanup finishes them. Results stay bit-exact incl. the hit tape, and
    the kernel must have actually marched (not everything via cleanup)."""
    st, cs, cam_pos, cam_rot = scene
    key = jax.random.PRNGKey(5)
    rays = _rays(st, cam_pos, cam_rot, 1024, key)
    ref = march(st, cs.spec, cs.arrays, rays, key=key, background="sky",
                mode="while", programs_used=cs.programs_used, record_hits=16)
    nocc = int((np.asarray(cs.arrays.chunk_res) > 0).sum())
    cap = max(8, nocc // 3)  # force a 3x overflow
    out, (trips, eps) = march_blockwise(
        st, cs.spec, cs.arrays, rays, key=key, background="sky",
        programs_used=cs.programs_used, record_hits=16, resident=True,
        resident_cap=cap, pool_center=cam_pos, byte_planes=True,
        inner_cap=4, ep_cap=192, interpret=True, return_trips=True)
    _assert_same(ref, out)
    assert int(trips) > 0, "hot chunks must march in-kernel"
    # without pool_center the first-N pool is arbitrary; heat ordering is
    # the difference between a useful and a useless pool on big scenes —
    # but both must stay exact
    out2 = march_blockwise(
        st, cs.spec, cs.arrays, rays, key=key, background="sky",
        programs_used=cs.programs_used, record_hits=16, resident=True,
        resident_cap=cap, byte_planes=True,
        inner_cap=4, ep_cap=192, interpret=True)
    _assert_same(ref, out2)


def test_blockmarch_group_loops_bitexact(scene):
    """Per-group independent march (group_loops=True, _make_group_kernel):
    each 256-lane group runs its own episode/inner loops over the resident
    pool — the in-kernel fix for the measured 8.5x trip imbalance. Must be
    bit-exact vs the XLA march incl. the hit tape, and must pay FAR fewer
    group-trips than tile-trips x groups would."""
    st, cs, cam_pos, cam_rot = scene
    key = jax.random.PRNGKey(3)
    rays = _rays(st, cam_pos, cam_rot, 2048, key)
    ref = march(st, cs.spec, cs.arrays, rays, key=key, background="sky",
                mode="while", programs_used=cs.programs_used, record_hits=16)
    out, (gtrips, geps) = march_blockwise(
        st, cs.spec, cs.arrays, rays, key=key, background="sky",
        programs_used=cs.programs_used, record_hits=16, resident=True,
        group_loops=True, byte_planes=True, inner_cap=2, ep_cap=384,
        interpret=True, return_trips=True)
    _assert_same(ref, out)
    ref_t, (ttrips, teps) = march_blockwise(
        st, cs.spec, cs.arrays, rays, key=key, background="sky",
        programs_used=cs.programs_used, record_hits=16, resident=True,
        byte_planes=True, inner_cap=2, ep_cap=384,
        interpret=True, return_trips=True)
    _assert_same(ref, ref_t)
    groups = 2048 // 256
    assert int(gtrips) < int(ttrips) * groups, (int(gtrips), int(ttrips))


def test_blockmarch_group_loops_variants(scene):
    """group_loops across f32 blocks, small caps (cleanup path), traversed
    feedback and non-aligned n — all bit-exact."""
    st, cs, cam_pos, cam_rot = scene
    key = jax.random.PRNGKey(7)
    rays = _rays(st, cam_pos, cam_rot, 1500, key)
    ref = march(st, cs.spec, cs.arrays, rays, key=key, background="sky",
                mode="while", programs_used=cs.programs_used,
                record_hits=16, record_traversed=True)
    for kw in (dict(),  # f32 halves pool
               dict(byte_planes=True, ep_cap=6, inner_cap=2),  # cleanup
               dict(byte_planes=True, record_traversed=True)):
        rt = kw.pop("record_traversed", False)
        out = march_blockwise(
            st, cs.spec, cs.arrays, rays, key=key, background="sky",
            programs_used=cs.programs_used, record_hits=16, resident=True,
            group_loops=True, interpret=True, record_traversed=rt, **kw)
        _assert_same(ref, out)
        if rt:
            np.testing.assert_array_equal(np.asarray(out.traversed),
                                          np.asarray(ref.traversed))


def test_blockmarch_flat_bitexact(scene):
    """Straight-line trip bodies (flat=True): coarse/fetch/shade/record run
    unconditionally — must be bit-exact vs the XLA march incl. the hit tape
    (every gated body is mask-correct without its gate)."""
    st, cs, cam_pos, cam_rot = scene
    key = jax.random.PRNGKey(3)
    rays = _rays(st, cam_pos, cam_rot, 2048, key)
    ref = march(st, cs.spec, cs.arrays, rays, key=key, background="sky",
                mode="while", programs_used=cs.programs_used, record_hits=16)
    for kw in (dict(resident=True, byte_planes=True, inner_cap=2,
                    ep_cap=384),
               dict(resident=True, inner_cap=4, ep_cap=192),  # f32 halves
               dict(ep_cap=32, inner_cap=24)):  # paged vote+DMA
        out = march_blockwise(st, cs.spec, cs.arrays, rays, key=key,
                              background="sky",
                              programs_used=cs.programs_used,
                              record_hits=16, flat=True, interpret=True,
                              **kw)
        _assert_same(ref, out)
