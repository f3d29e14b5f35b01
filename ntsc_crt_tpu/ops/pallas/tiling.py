"""Shared block-height selection for the row-tiled Pallas kernels.

The fused kernels tile rows as (RB, T, sub, LANE) with one grid step per
row block of ``sub * LANE`` rows.  Large batches want the full block height
(VPU-filling tiles); batch-1 / live runs (~240 rows) would pad up to a full
block otherwise, wasting most of the kernel's work on zero rows.

Mosaic constrains the sublane dimension of a block to the packed dtype
tiling: int8/uint8 planes pack 4 rows per 32-bit word, so ``sub`` must stay
a multiple of 4 (an unaligned block height fails to lower on real TPU even
though interpret mode accepts it).
"""


def shrink_sub(n_rows: int, full_sub: int, lane: int = 128) -> int:
    """Block height (in sublanes) for ``n_rows`` total rows.

    Returns ``full_sub`` when the batch fills at least one full block;
    otherwise the smallest multiple of 4 covering the rows, capped at
    ``full_sub``.
    """
    if n_rows >= full_sub * lane:
        return full_sub
    need = -(-n_rows // lane)
    return min(full_sub, max(4, -(-need // 4) * 4))
