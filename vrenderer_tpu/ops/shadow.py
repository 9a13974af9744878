"""Terrain shadowing.

The reference renders a 1-cascade 2048^2 shadow map (depth-only terrain +
scene raster from the sun's ortho view, Renderer.cpp:83-93,333-380) and
PCF-samples it per pixel in deferred lighting. Per-pixel shadow-map
sampling is a gather — two orders of magnitude too slow on TPU — so the
default shadow technique here is TPU-native and mathematically equivalent
for a heightfield occluder set:

**Horizon-map shadows**: march the heightfield toward the sun in texture
space with whole-texture fractional shifts (dense, gather-free), recording
the maximum occluder slope. A texel is lit when the sun's elevation slope
clears that horizon slope; a soft band around the threshold approximates
PCF's penumbra. The result is a world-space shadow-factor field sampled at
terrain vertices (separable matmuls, ops/texture.py) and interpolated by
the rasterizer — the same role the reference's shadow map plays for the
terrain, at the same effective resolution (its 2048 m / 2048 px cascade is
1 m/texel, matching the heightfield's own sampling density).

``render_shadow_depth`` also provides the reference-shaped depth-only
raster pass from the light's view ("Terrain Shadow" counter,
Renderer.cpp:354) built on the same rasterizer, for capability parity and
tests; see renderer.py for how it is wired.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vrenderer_tpu.utils import math3d


def _shift2d(tex: jnp.ndarray, du: jnp.ndarray, dv: jnp.ndarray) -> jnp.ndarray:
    """Shift a (H, W) field by a traced fractional (du, dv) in uv units,
    clamp addressing. Two 2-tap axis blends; row/col takes are contiguous.
    """
    H, W = tex.shape

    def axis_shift(t, d, size, axis):
        s = d * (size - 1)
        i0 = jnp.floor(s).astype(jnp.int32)
        f = s - i0.astype(jnp.float32)
        idx = jnp.arange(size, dtype=jnp.int32)
        a = jnp.take(t, jnp.clip(idx + i0, 0, size - 1), axis=axis)
        b = jnp.take(t, jnp.clip(idx + i0 + 1, 0, size - 1), axis=axis)
        return a * (1.0 - f) + b * f

    out = axis_shift(tex, du, W, 1)
    return axis_shift(out, dv, H, 0)


def horizon_shadow_field(
    heightmap: jnp.ndarray,       # (H, W) in [0, 1]
    max_height: jnp.ndarray,      # scalar, world units
    world_size: float,
    light_direction: jnp.ndarray,  # (3,) direction light TRAVELS (dir.y < 0)
    num_steps: int = 24,
    softness_slope: float = 0.03,
    bias: float = 0.5,
    occluder_h: jnp.ndarray | None = None,  # (H, W) world units
    with_shadow_line: bool = False,
) -> jnp.ndarray:
    """Shadow factor field over the world, (H, W) in [0, 1] (1 = lit).

    For each texel, marches toward the sun (-light_direction) with
    log-spaced world-distance steps from one texel up to half the world,
    tracking max((occluder_height - ray_height) / distance) — the excess
    slope over the sun ray. Lit where the excess is <= 0; a smooth ramp of
    width ``softness_slope`` emulates the reference's PCF penumbra.

    ``occluder_h`` (world units) adds non-terrain occluders: the march
    runs over max(terrain, occluder_h), so scene meshes rendered into a
    top-down height field (``mesh_top_field``) cast onto terrain — the
    role of the scene DepthPass in the reference's shadow phase
    (Renderer.cpp:371-379).

    ``with_shadow_line=True`` also returns the shadow-line height field
    S(x, z) = max_t(occ(x + t*sun_xz) - t*sun_slope): the minimum world
    height that is lit at each texel. Arbitrary receivers (mesh vertices)
    test their own height against S (``shadow_line_factor``) — how scene
    meshes RECEIVE terrain/mesh shadows without any per-pixel map lookup.
    """
    Ht, Wt = heightmap.shape
    sun = -jnp.asarray(light_direction, jnp.float32)
    sun = sun / jnp.sqrt(jnp.sum(sun * sun) + 1e-20)
    horiz = jnp.sqrt(sun[0] ** 2 + sun[2] ** 2)
    # slope of the sun ray per world meter of horizontal travel
    sun_slope = sun[1] / jnp.maximum(horiz, 1e-6)
    dir_u = sun[0] / jnp.maximum(horiz, 1e-6)
    dir_v = sun[2] / jnp.maximum(horiz, 1e-6)

    h_world = heightmap * max_height
    occ_field = h_world
    if occluder_h is not None:
        occ_field = jnp.maximum(occ_field, occluder_h)
    texel = world_size / Wt
    t0 = texel
    t1 = world_size * 0.5
    ratio = (t1 / t0) ** (1.0 / (num_steps - 1))

    excess = jnp.full_like(heightmap, -1e9)
    # NOT seeded with occ_field itself: a receiver sitting exactly on the
    # surface must not count the surface as its own occluder (the march
    # starts one texel out, matching the slope form)
    sline = jnp.full_like(heightmap, -1e9)
    t = t0
    for _ in range(num_steps):
        du = dir_u * (t / world_size)
        dv = dir_v * (t / world_size)
        occ = _shift2d(occ_field, du, dv)
        excess = jnp.maximum(excess, (occ - (h_world + bias)) / t - sun_slope)
        if with_shadow_line:
            sline = jnp.maximum(sline, occ - t * sun_slope)
        t *= ratio

    lit = 1.0 - jnp.clip(excess / softness_slope + 1.0, 0.0, 1.0)
    # sun at/below the horizon: fully shadowed
    below = sun[1] <= 0.0
    lit = jnp.where(below, jnp.zeros_like(lit), lit)
    if with_shadow_line:
        sline = jnp.where(below, jnp.full_like(sline, 1e9), sline)
        return lit, sline
    return lit


def shadow_line_factor(
    y: jnp.ndarray,        # receiver world heights (...)
    sline: jnp.ndarray,    # shadow-line heights at the receiver xz (...)
    softness_h: float = 2.0,
    bias: float = 0.5,
) -> jnp.ndarray:
    """Shadow factor for receivers at height ``y`` against the shadow-line
    field: lit where y clears S, with a ``softness_h``-meter penumbra ramp
    (the height-space analog of horizon_shadow_field's slope ramp)."""
    excess = sline - (y + bias)
    return 1.0 - jnp.clip(excess / softness_h + 1.0, 0.0, 1.0)


def mesh_top_field(
    world: jnp.ndarray,     # (B, 3*tpb, 3) scene block vertices
    valid: jnp.ndarray,     # (B,)
    world_size: float,
    resolution: int,
) -> jnp.ndarray:
    """Top-down max-height field of scene geometry, (res, res) world units
    (-1e9 where empty), aligned with the heightmap's texel lattice
    (world_to_uv mapping). Rendered with the XLA rasterizer from an
    overhead ortho view — scene triangle counts are tiny (blocks of
    padded meshes), so the dense sweep is microseconds on the VPU.

    Reference analog: scene meshes drawn into the shadow map by
    RenderCompositeView(DepthPass) (Renderer.cpp:371-379); here they
    enter the horizon march as occluders instead.
    """
    from vrenderer_tpu.ops import raster
    from vrenderer_tpu.utils import math3d

    # overhead view looking straight down with up=(0,0,-1): pixel columns
    # increase with +x, rows with +z, so pixel (row, col) = texel (v, u)
    eye = jnp.asarray([0.0, 1e4, 0.0], jnp.float32)
    target = jnp.zeros(3, jnp.float32)
    up = jnp.asarray([0.0, 0.0, -1.0], jnp.float32)
    w2v = math3d.look_at(eye, target, up)
    # bounds chosen so PIXEL CENTERS land on world_to_uv's texel lattice
    # (texel i at world i*texel - half, texel = world/(res-1))
    texel = world_size / (resolution - 1)
    ext = world_size * 0.5 + texel * 0.5
    proj = math3d.ortho_proj_d3d_style(-ext, ext, -ext, ext, 1.0, 2e4)
    wtc = math3d.view_proj(w2v, proj)
    B = world.shape[0]
    tpb = world.shape[1] // 3
    attrs = jnp.zeros(world.shape[:2] + (1,), jnp.float32)
    idx = jnp.arange(tpb * 3, dtype=jnp.int32).reshape(tpb, 3)
    # oracle raster wants (8, 128)-tile-multiple dimensions; pad + crop
    pw = -(-resolution // 128) * 128
    ph = -(-resolution // 8) * 8
    setup = raster.setup_triangles(
        world, attrs, valid, idx, wtc, resolution, resolution,
    )
    z, prim, _ = raster.rasterize_xla(setup, pw, ph)
    z = z[:resolution, :resolution]
    prim = prim[:resolution, :resolution]
    # ortho depth z in [0,1] maps linearly near->far from eye height
    height = eye[1] - (1.0 + z * (2e4 - 1.0))
    return jnp.where(prim >= 0, height, -1e9)


def shadow_factors_from_map(
    depth_map: jnp.ndarray,   # (R, R) light-view z01 (1 = empty/far)
    wtc: jnp.ndarray,         # (4, 4) light world->clip (ortho)
    z_range: float,           # light near..far extent in meters
    points: jnp.ndarray,      # (N, 3) world receiver points
    bias_m: float = 2.0,
    pcf_px: float = 1.0,
    chunk: int = 8192,
) -> jnp.ndarray:
    """Shadow factors by filtered comparison sampling of a light-view
    depth map — the PCF step of the reference's DeferredLightingPass
    (Renderer.cpp:417-428), restructured for TPU: receivers are
    vertex-rate points (terrain texel surface points, mesh vertices),
    each sampled with 4 offset taps via the gather-free matmul sampler
    and compared in depth, then averaged. Returns (N,) in [0, 1].
    """
    from vrenderer_tpu.ops import texture

    R = depth_map.shape[0]
    N = points.shape[0]
    # the matmul sampler's cost is chunk-granular (each chunk pays a
    # (chunk, R) x (R, R) pass): small receiver sets (a few scene-mesh
    # vertices) must not pad up to the full 8192 default
    chunk = min(chunk, max(512, -(-N // 512) * 512))
    pad = (-N) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    bias01 = bias_m / z_range
    taps = jnp.asarray(
        [(-0.5, -0.5), (0.5, -0.5), (-0.5, 0.5), (0.5, 0.5)], jnp.float32
    ) * pcf_px

    def one_chunk(p):
        clip = math3d.transform_points_h(wtc, p)      # ortho: w == 1
        ndc = clip[:, :3]
        # pixel coords (y-down) -> texel-lattice u01 for the sampler
        px = (ndc[:, 0] + 1.0) * 0.5 * R - 0.5
        py = (1.0 - ndc[:, 1]) * 0.5 * R - 0.5
        d = ndc[:, 2]
        acc = jnp.zeros(p.shape[0], jnp.float32)
        for i in range(taps.shape[0]):
            u01 = (px + taps[i, 0]) / (R - 1)
            v01 = (py + taps[i, 1]) / (R - 1)
            md = texture.sample_points_matmul(depth_map, u01, v01)
            acc = acc + (md >= d - bias01).astype(jnp.float32)
        return acc / taps.shape[0]

    out = jax.lax.map(one_chunk, pts.reshape(-1, chunk, 3))
    return out.reshape(-1)[:N]


def sun_shear_matrices(
    light_direction: jnp.ndarray,  # (3,) direction light TRAVELS (y < 0)
    world_size: float,
    max_height: jnp.ndarray,
    resolution: int,
    k_max: float = 4.0,
):
    """Sun-ray-aligned (sheared) world->clip for the light-view depth
    raster — the TPU-native shadow-map parameterization.

    The reference's shadow phase renders depth from an arbitrary ortho
    sun view and PCF-samples it per pixel (Renderer.cpp:333-428). An
    arbitrary ortho rotation makes the receiver->map mapping a rotated
    lattice, which forces per-point sampling (O(N*R^2) matmuls on TPU,
    measured ~180 ms/frame at 2048^2). This projection instead follows
    each sun ray to its y=0 ground intersection and uses THAT point as
    the map pixel: map coords (x + y*kx, z + y*kz) with
    (kx, kz) = horizontal light travel per meter of drop, depth linear
    in world height (higher = closer to the sun). It is still a genuine
    depth-only raster along sun rays — same occluder set, same
    comparison semantics — but the map lattice now lands axis-aligned
    on the world's xz lattice, so terrain receivers sample it with
    SEPARABLE matmuls (factors_from_sun_shear_map) instead of per-point
    one-hots. ``shadow_factors_from_map`` works unchanged against the
    returned matrix for arbitrary (mesh-vertex) receivers.

    Shear magnitude is clamped to ``k_max`` (a sun below ~14 deg
    elevation stretches shadows across the whole world; the horizon
    fallback there is handled by the caller via sun_y <= 0 darkness,
    matching horizon_shadow_field).

    The map spans the world PLUS ``max_height * |k|`` per axis: a
    receiver at height h grounds its ray up to that far outside the
    world, so without the pad edge-clamping would fabricate shadows
    near the borders. Pixel centers land on the span's texel lattice
    (same half-texel construction as mesh_top_field). Returns
    (wtc (4, 4), kx, kz, span_x, span_z) — spans in world meters, used
    by factors_from_sun_shear_map's world->map mapping.
    """
    d = jnp.asarray(light_direction, jnp.float32)
    d = d / jnp.sqrt(jnp.sum(d * d) + 1e-20)
    drop = jnp.maximum(-d[1], 1e-3)  # meters of fall per unit travel
    kx = d[0] / drop
    kz = d[2] / drop
    # clamp the shear VECTOR magnitude, preserving direction: clamping
    # the components independently would rotate the shadow azimuth for
    # low azimuth-asymmetric suns (e.g. 10 deg elevation at 20 deg
    # azimuth: kx binds, kz does not)
    norm = jnp.sqrt(kx * kx + kz * kz)
    scale = jnp.minimum(1.0, k_max / jnp.maximum(norm, 1e-6))
    kx = kx * scale
    kz = kz * scale
    # row-vector shear: ground = (x + y*kx, z + y*kz), height untouched
    shear = jnp.array(
        [
            [1.0, 0.0, 0.0, 0.0],
            [0.0, 1.0, 0.0, 0.0],
            [0.0, 0.0, 1.0, 0.0],
            [0.0, 0.0, 0.0, 1.0],
        ],
        jnp.float32,
    )
    shear = shear.at[1, 0].set(kx).at[1, 2].set(kz)
    span_x = world_size + 2.0 * max_height * jnp.abs(kx)
    span_z = world_size + 2.0 * max_height * jnp.abs(kz)
    # overhead ortho with pixel centers on the span's texel lattice
    # (mesh_top_field's construction, shadow.py:165-170); pixel columns
    # increase with +x (sheared), rows with +z
    eye = jnp.asarray([0.0, _SHEAR_EYE_H, 0.0], jnp.float32)
    target = jnp.zeros(3, jnp.float32)
    up = jnp.asarray([0.0, 0.0, -1.0], jnp.float32)
    w2v = math3d.look_at(eye, target, up)
    ext_x = span_x * 0.5 + span_x / (resolution - 1) * 0.5
    ext_z = span_z * 0.5 + span_z / (resolution - 1) * 0.5
    proj = math3d.ortho_proj_d3d_style(
        -ext_x, ext_x, -ext_z, ext_z, 1.0, _SHEAR_FAR
    )
    wtc = shear @ math3d.view_proj(w2v, proj)
    return wtc, kx, kz, span_x, span_z


# sheared light view constants: depth z01 maps linearly to world height
# as h = EYE_H - (1 + z * (FAR - 1))
_SHEAR_EYE_H = 1.0e4
_SHEAR_FAR = 2.0e4


def shear_map_heights(depth_map: jnp.ndarray,
                      covered: jnp.ndarray) -> jnp.ndarray:
    """Sheared-view z01 depth map -> occluder-height map S0 (world
    meters; -1e9 where no occluder). S0(u, v) is the highest occluder
    on the sun-ray bundle grounding at texel (u, v) — the shadow-line
    field at ground level."""
    h = _SHEAR_EYE_H - (1.0 + depth_map * (_SHEAR_FAR - 1.0))
    return jnp.where(covered, h, -1e9)


def factors_from_sun_shear_map(
    s0: jnp.ndarray,           # (R, R) occluder heights (shear_map_heights)
    heightmap: jnp.ndarray,    # (H, W) in [0, 1]
    max_height: jnp.ndarray,
    world_size: float,
    kx: jnp.ndarray,
    kz: jnp.ndarray,
    span_x: jnp.ndarray,       # map world spans (sun_shear_matrices)
    span_z: jnp.ndarray,
    sun_up: jnp.ndarray,       # scalar: sun above horizon? (y component)
    num_slabs: int = 17,
    bias: float = 2.0,
    pcf_px: float = 1.0,
) -> jnp.ndarray:
    """Terrain shadow factors from the sheared light-view map — the PCF
    step of the reference's DeferredLightingPass (Renderer.cpp:417-428)
    restructured for the terrain-lattice receiver set.

    A receiver at (x, h, z) grounds its sun ray at (x + h*kx, z + h*kz)
    and is lit when h + bias clears S0 there. For a FIXED height h the
    sample set over the terrain lattice is a regular grid (constant
    offset), so each of ``num_slabs`` height slabs is one SEPARABLE
    bilinear sample (two matmuls); the per-texel factor interpolates the
    two bracketing slabs' comparison results (compare-then-filter, the
    PCF ordering) with 4 half-texel spatial taps folded into the same
    passes. O(num_slabs * R * H * W) MXU FLOPs — ~25x less than
    per-point sampling at 2048^2/256^2.
    """
    from vrenderer_tpu.ops import texture

    R = s0.shape[0]
    Ht, Wt = heightmap.shape
    h_world = heightmap * max_height
    gx = jnp.linspace(-world_size / 2, world_size / 2, Wt)
    gz = jnp.linspace(-world_size / 2, world_size / 2, Ht)
    dh = max_height / (num_slabs - 1)

    # 4 PCF taps at +-pcf_px/2 map texels, folded pairwise: 2 row-interp
    # matrices x 2 col-interp matrices
    tap = 0.5 * pcf_px / (R - 1)

    lit_slabs = []
    for k in range(num_slabs):
        hk = dh * k
        u = (gx + hk * kx) / span_x + 0.5         # (Wt,)
        v = (gz + hk * kz) / span_z + 0.5         # (Ht,)
        acc = jnp.zeros((Ht, Wt), jnp.float32)
        for du in (-tap, tap):
            for dv in (-tap, tap):
                sk = texture.sample_separable(
                    s0, u + du, v + dv,
                    precision=jax.lax.Precision.HIGHEST,
                )                                  # (Ht, Wt)
                acc = acc + (
                    h_world + bias >= sk
                ).astype(jnp.float32)
        lit_slabs.append(acc * 0.25)
    lit_k = jnp.stack(lit_slabs, axis=0)          # (num_slabs, Ht, Wt)

    # per-texel hat blend between the two bracketing slabs
    t = jnp.clip(h_world / dh, 0.0, num_slabs - 1)
    kf = jnp.arange(num_slabs, dtype=jnp.float32)[:, None, None]
    wk = jnp.maximum(0.0, 1.0 - jnp.abs(t[None] - kf))
    lit = jnp.sum(wk * lit_k, axis=0)
    return jnp.where(sun_up > 0.0, lit, jnp.zeros_like(lit))


def light_view_matrices(
    light_direction: jnp.ndarray,  # (3,)
    world_size: float,
    max_height: jnp.ndarray,
    resolution: int,
):
    """Ortho world->clip for the sun, covering the whole terrain.

    The reference's CascadedShadowMap::SetupForPlanarViewStable is driven
    with maxShadowDistance = zRange = WORLD_SIZE (Renderer.cpp:345-348),
    i.e. its single cascade effectively spans the world; this builds the
    equivalent stable whole-world ortho view.
    """
    d = -jnp.asarray(light_direction, jnp.float32)
    d = d / jnp.sqrt(jnp.sum(d * d) + 1e-20)
    center = jnp.zeros(3, jnp.float32)
    eye = center + d * (world_size * 1.5)
    up = jnp.where(
        jnp.abs(d[1]) > 0.99,
        jnp.array([0.0, 0.0, 1.0], jnp.float32),
        jnp.array([0.0, 1.0, 0.0], jnp.float32),
    )
    w2v = math3d.look_at(eye, center, up)
    half = world_size * 0.75
    proj = math3d.ortho_proj_d3d_style(
        -half, half, -half, half, 0.1, world_size * 3.0
    )
    return math3d.view_proj(w2v, proj)
