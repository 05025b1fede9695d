"""Fixed sinusoidal position-embedding tables.

Tables are built once with numpy at model-construction time and baked into
the jitted graph as constants (they are not trained). Conventions follow the
AudioMAE-lineage sin-cos tables used by the reference
(/root/reference/wavjepa/pos_embed.py:75-151): for a 1-D grid the first half
of the embedding dim is sin, the second half cos, with frequencies
``1 / 10000**(2i/D)``.
"""

from __future__ import annotations

import numpy as np


def get_1d_sincos_pos_embed_from_grid(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """Sin-cos embedding of arbitrary (possibly fractional) positions.

    Args:
        embed_dim: output dimension per position (must be even).
        pos: positions to encode, any shape; flattened to (M,).

    Returns:
        (M, embed_dim) float64 table: [sin | cos] halves.
    """
    if embed_dim % 2 != 0:
        raise ValueError(f"embed_dim must be even, got {embed_dim}")
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000**omega  # (D/2,)

    pos = np.asarray(pos, dtype=np.float64).reshape(-1)  # (M,)
    out = np.einsum("m,d->md", pos, omega)  # (M, D/2)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)  # (M, D)


def get_1d_sincos_pos_embed(embed_dim: int, length: int) -> np.ndarray:
    """1-D table for integer positions 0..length-1 → (length, embed_dim)."""
    return get_1d_sincos_pos_embed_from_grid(
        embed_dim, np.arange(length, dtype=np.float64)
    )


def get_2d_sincos_pos_embed(
    embed_dim: int, grid_size: int | tuple[int, int], cls_token_num: int = 0
) -> np.ndarray:
    """2-D table over an (H, W) grid; H-half and W-half concatenated.

    Mirrors the reference's 2-D variant (pos_embed.py:22-72); used only for
    spectrogram-style models, kept for API completeness.
    """
    if isinstance(grid_size, int):
        g_h = g_w = grid_size
    else:
        g_h, g_w = grid_size
    grid_h = np.arange(g_h, dtype=np.float64)
    grid_w = np.arange(g_w, dtype=np.float64)
    grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0)  # w first
    emb_h = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[0])
    emb_w = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[1])
    pos_embed = np.concatenate([emb_h, emb_w], axis=1)
    for _ in range(cls_token_num):
        pos_embed = np.concatenate([np.zeros([1, embed_dim]), pos_embed], axis=0)
    return pos_embed


def get_binaural_pos_embed(embed_dim: int, time_steps: int = 100) -> np.ndarray:
    """Binaural table: per-channel halves share a time code, differ in a
    channel code (left = zeros, right = the position-1 encoding), then the two
    channels' tables are concatenated along the sequence axis.

    Matches /root/reference/wavjepa/pos_embed.py:122-151 so that Nat-model
    weights remain interchangeable.
    """
    if embed_dim % 2 != 0:
        raise ValueError(f"embed_dim must be even, got {embed_dim}")
    time_embed = get_1d_sincos_pos_embed(embed_dim // 2, time_steps)
    channel_left = np.zeros((time_steps, embed_dim // 2))
    channel_right = np.tile(
        get_1d_sincos_pos_embed(embed_dim // 2, 1), (time_steps, 1)
    )
    left = np.concatenate([time_embed, channel_left], axis=1)
    right = np.concatenate([time_embed, channel_right], axis=1)
    return np.concatenate([left, right], axis=0)


def interpolate_pos_embed_1d(table: np.ndarray, new_len: int) -> np.ndarray:
    """Resize a loaded (T, D) positional table to (new_len, D) by per-dim
    linear interpolation over a normalized position grid.

    Counterpart of the reference's checkpoint pos-embed interpolation helpers
    (/root/reference/wavjepa/pos_embed.py:158-267), used when loading weights
    trained at a different `process_seconds` / patch count.
    """
    table = np.asarray(table)
    old_len, dim = table.shape
    if old_len == new_len:
        return table
    old_grid = np.linspace(0.0, 1.0, old_len)
    new_grid = np.linspace(0.0, 1.0, new_len)
    out = np.empty((new_len, dim), table.dtype)
    for d in range(dim):
        out[:, d] = np.interp(new_grid, old_grid, table[:, d])
    return out


def interpolate_pos_embed_2d(
    table: np.ndarray, old_size: tuple[int, int], new_size: tuple[int, int]
) -> np.ndarray:
    """Resize a (H·W, D) 2-D positional table to a new (H', W') grid with
    bilinear interpolation (reference pos_embed.py 2-D variant)."""
    table = np.asarray(table)
    h, w = old_size
    nh, nw = new_size
    dim = table.shape[1]
    grid = table.reshape(h, w, dim)
    # interpolate rows then columns
    row_interp = np.empty((nh, w, dim), table.dtype)
    old_h = np.linspace(0.0, 1.0, h)
    new_h = np.linspace(0.0, 1.0, nh)
    for j in range(w):
        for d in range(dim):
            row_interp[:, j, d] = np.interp(new_h, old_h, grid[:, j, d])
    out = np.empty((nh, nw, dim), table.dtype)
    old_w = np.linspace(0.0, 1.0, w)
    new_w = np.linspace(0.0, 1.0, nw)
    for i in range(nh):
        for d in range(dim):
            out[i, :, d] = np.interp(new_w, old_w, row_interp[i, :, d])
    return out.reshape(nh * nw, dim)
