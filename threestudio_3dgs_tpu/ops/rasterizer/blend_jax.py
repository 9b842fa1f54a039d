"""Tile blend, pure-JAX implementation (forward + hand-derived backward).

This is the portable twin of the Pallas kernel in `blend_pallas.py`: identical
chunked algorithm and numerics, runs on CPU/TPU via XLA, used as the oracle for
kernel parity tests and as a fallback path.  Both live behind the custom-VJP
boundary in `api.py`, so `while_loop` is fine in either direction.

Algorithm (per tile of `tile_size`^2 pixels, pairs in depth order):

  forward:  carry raw transmittance R (product of ALL (1-alpha) seen so far,
  never frozen).  A pair is blended iff its inclusive product R_i >= 1e-4.
  Because R is monotone non-increasing this reproduces the CUDA loop's sticky
  `done` flag exactly (renderCUDA: test_T < 1e-4 -> done, Gaussian skipped),
  and the actual (frozen) transmittance equals R at the last included pair --
  so alpha_out = sum of weights needs no separate carry.  Accumulation into
  the (C+1, npix) output is a (chunk x C+1)^T @ (chunk x npix) matmul: MXU.

  backward: runs in FORWARD order.  The suffix sums S_i = sum_{k>i} u_k w_k
  (u_i = <colors_i, g>) needed for d alpha are obtained as U_tot - prefix_i,
  where U_tot = <g, out> comes from the forward output -- no reverse walk,
  no division-by-(1-alpha) reconstruction, no T checkpoints.

Per-pair feature layout (F = 6 + C columns):
  [x, y, conic_a, conic_b, conic_c, opacity, color_0 .. color_{C-1}]
Output: (num_tiles, npix, C+1); channel C is the blended weight sum
(= alpha map = 1 - final transmittance).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

CHUNK = 64  # pairs processed per inner step
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


def _tile_pixel_coords(tile_idx, grid_x: int, tile_size: int, view_grid_y: int = 0):
    """Pixel-center coordinates of a tile's pixels, x-major, (npix,) each.

    With `view_grid_y` > 0 (batched multi-view: B views stacked vertically as
    tile rows), coordinates are VIEW-LOCAL (ty mod view_grid_y) so the pair
    math stays bit-identical to the single-view render."""
    npix = tile_size * tile_size
    tx = tile_idx % grid_x
    ty = tile_idx // grid_x
    if view_grid_y:
        ty = ty % view_grid_y
    lane = jnp.arange(npix, dtype=jnp.float32)
    px = tx * tile_size + lane % tile_size
    py = ty * tile_size + lane // tile_size
    return px, py


def _chunk_alpha(feats, px, py, pmask):
    """alpha (CHUNK, npix) with all skip rules applied; plus G=exp(power) and
    the raw geometric terms needed by backward."""
    x = feats[:, 0:1]
    y = feats[:, 1:2]
    ca = feats[:, 2:3]
    cb = feats[:, 3:4]
    cc = feats[:, 4:5]
    opa = feats[:, 5:6]
    dx = px[None, :] - x
    dy = py[None, :] - y
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    gauss = jnp.exp(jnp.minimum(power, 0.0))
    alpha = opa * gauss
    ok = (power <= 0.0) & (alpha >= ALPHA_MIN) & pmask[:, None]
    alpha = jnp.where(ok, jnp.minimum(alpha, ALPHA_MAX), 0.0)
    # clamp-gradient mask: where alpha hit ALPHA_MAX the derivative wrt
    # opacity/power is zero (deviation from CUDA, which leaks gradient
    # through the clamp; documented in SURVEY quirks)
    unclamped = ok & (opa * gauss < ALPHA_MAX)
    return alpha, gauss, dx, dy, unclamped


def blend_forward(
    pair_feats: jnp.ndarray,  # (P, F)
    tile_ranges: jnp.ndarray,  # (T+1,)
    grid_x: int,
    grid_y: int,
    tile_size: int,
    n_channels: int,
    view_grid_y: int = 0,
) -> jnp.ndarray:
    """Returns (num_tiles, npix, C+1)."""
    npix = tile_size * tile_size
    n_out = n_channels + 1
    feats_p = jnp.pad(pair_feats, ((0, CHUNK), (0, 0)))

    def one_tile(tile_idx, start, end):
        px, py = _tile_pixel_coords(tile_idx, grid_x, tile_size, view_grid_y)

        def cond(carry):
            base, raw, _ = carry
            return (base < end) & (jnp.max(raw) >= T_EPS)

        def body(carry):
            base, raw, out = carry
            feats = jax.lax.dynamic_slice(feats_p, (base, 0), (CHUNK, feats_p.shape[1]))
            pmask = base + jnp.arange(CHUNK, dtype=jnp.int32) < end
            alpha, _, _, _, _ = _chunk_alpha(feats, px, py, pmask)
            om = 1.0 - alpha
            cum_incl = raw[None, :] * jnp.cumprod(om, axis=0)
            include = cum_incl >= T_EPS
            cum_excl = jnp.concatenate([raw[None, :], cum_incl[:-1]], axis=0)
            w = jnp.where(include, alpha * cum_excl, 0.0)
            colors_ext = jnp.concatenate(
                [feats[:, 6 : 6 + n_channels], jnp.ones((CHUNK, 1))], axis=1
            )
            out = out + jnp.einsum(
                "kc,kp->pc", colors_ext, w, precision=jax.lax.Precision.HIGHEST
            )
            return base + CHUNK, cum_incl[-1], out

        init = (start, jnp.ones(npix), jnp.zeros((npix, n_out)))
        _, _, out = jax.lax.while_loop(cond, body, init)
        return out

    num_tiles = grid_x * grid_y
    return jax.vmap(one_tile)(
        jnp.arange(num_tiles, dtype=jnp.int32),
        tile_ranges[:-1],
        tile_ranges[1:],
    )


def blend_backward(
    pair_feats: jnp.ndarray,  # (P, F)
    tile_ranges: jnp.ndarray,
    out: jnp.ndarray,  # (T, npix, C+1) forward output
    g_out: jnp.ndarray,  # (T, npix, C+1) incoming cotangent
    grid_x: int,
    grid_y: int,
    tile_size: int,
    n_channels: int,
    view_grid_y: int = 0,
) -> jnp.ndarray:
    """Returns d pair_feats (P, F).  Each pair belongs to exactly one tile, so
    per-tile writes into the pair-grad table never collide."""
    npix = tile_size * tile_size
    p_total, f_dim = pair_feats.shape
    feats_p = jnp.pad(pair_feats, ((0, CHUNK), (0, 0)))
    num_tiles = grid_x * grid_y

    def one_tile(grads, tile_idx, start, end, out_t, g_t):
        px, py = _tile_pixel_coords(tile_idx, grid_x, tile_size, view_grid_y)
        u_tot = jnp.sum(g_t * out_t, axis=1)  # (npix,)

        def cond(carry):
            base, raw, _, _ = carry
            return (base < end) & (jnp.max(raw) >= T_EPS)

        def body(carry):
            base, raw, prefix, grads = carry
            feats = jax.lax.dynamic_slice(feats_p, (base, 0), (CHUNK, f_dim))
            pmask = base + jnp.arange(CHUNK, dtype=jnp.int32) < end
            alpha, gauss, dx, dy, unclamped = _chunk_alpha(feats, px, py, pmask)
            om = 1.0 - alpha
            cum_incl = raw[None, :] * jnp.cumprod(om, axis=0)
            include = cum_incl >= T_EPS
            cum_excl = jnp.concatenate([raw[None, :], cum_incl[:-1]], axis=0)
            w = jnp.where(include, alpha * cum_excl, 0.0)

            colors_ext = jnp.concatenate(
                [feats[:, 6 : 6 + n_channels], jnp.ones((CHUNK, 1))], axis=1
            )
            # u_i = <color_i, g> per pixel: (CHUNK, npix) via MXU
            u = jnp.einsum(
                "kc,pc->kp", colors_ext, g_t, precision=jax.lax.Precision.HIGHEST
            )
            uw = u * w
            prefix_inc = prefix[None, :] + jnp.cumsum(uw, axis=0)
            suffix = u_tot[None, :] - prefix_inc  # S_i = sum_{k>i} u_k w_k

            # d alpha (only where included; suffix term via the (1-alpha)
            # factors of later weights)
            d_alpha = jnp.where(
                include, u * cum_excl - suffix / jnp.maximum(om, 1e-6), 0.0
            )
            d_gauss_term = jnp.where(unclamped, d_alpha, 0.0)
            opa = feats[:, 5:6]
            d_power = opa * gauss * d_gauss_term
            d_opa = jnp.sum(gauss * d_gauss_term, axis=1)
            ca = feats[:, 2:3]
            cb = feats[:, 3:4]
            cc = feats[:, 4:5]
            d_dx = d_power * (-(ca * dx + cb * dy))
            d_dy = d_power * (-(cc * dy + cb * dx))
            d_x = -jnp.sum(d_dx, axis=1)
            d_y = -jnp.sum(d_dy, axis=1)
            d_ca = jnp.sum(d_power * (-0.5 * dx * dx), axis=1)
            d_cb = jnp.sum(d_power * (-dx * dy), axis=1)
            d_cc = jnp.sum(d_power * (-0.5 * dy * dy), axis=1)
            # d colors: (CHUNK, C) = w @ g^T restricted to color channels
            d_colors = jnp.einsum(
                "kp,pc->kc", w, g_t[:, :n_channels], precision=jax.lax.Precision.HIGHEST
            )
            d_feats = jnp.concatenate(
                [
                    jnp.stack([d_x, d_y, d_ca, d_cb, d_cc, d_opa], axis=1),
                    d_colors,
                ],
                axis=1,
            )
            d_feats = jnp.where(pmask[:, None], d_feats, 0.0)
            grads = jax.lax.dynamic_update_slice(grads, d_feats, (base, 0))
            return base + CHUNK, cum_incl[-1], prefix_inc[-1], grads

        init = (start, jnp.ones(npix), jnp.zeros(npix), grads)
        _, _, _, grads = jax.lax.while_loop(cond, body, init)
        return grads

    # Tiles own disjoint, ascending pair ranges, so one grad table threads
    # through a scan over tiles and each chunk writes its own rows in place.
    def scan_body(grads, xs):
        tile_idx, start, end, out_t, g_t = xs
        return one_tile(grads, tile_idx, start, end, out_t, g_t), None

    grads, _ = jax.lax.scan(
        scan_body,
        jnp.zeros((p_total + CHUNK, f_dim)),
        (
            jnp.arange(num_tiles, dtype=jnp.int32),
            tile_ranges[:-1],
            tile_ranges[1:],
            out,
            g_out,
        ),
    )
    return grads[:p_total]


def tiles_to_image(
    tiled: jnp.ndarray, grid_x: int, grid_y: int, tile_size: int, height: int, width: int
) -> jnp.ndarray:
    """(T, npix, C) -> (H, W, C), cropping tile padding."""
    c = tiled.shape[2]
    img = tiled.reshape(grid_y, grid_x, tile_size, tile_size, c)
    img = img.transpose(0, 2, 1, 3, 4).reshape(
        grid_y * tile_size, grid_x * tile_size, c
    )
    return img[:height, :width]
