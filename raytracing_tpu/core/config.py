"""Render configuration.

Surfaces every magic constant of the reference as config (SURVEY §7 quirk 8):
shadow epsilon 0.001 (code.cl:659), exposure 1.8 (code.cl:1382), ambient 0.2
(Assign08 code.cl:929), degenerate-AABB inflation 0.1 (code.js:839-840),
fixed bounce count 5 (code.js:1829), spp default (code.js:399-400).
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    width: int = 320
    height: int = 240
    spp: int = 1                  # rays per pixel per pass (perfect square if >1)
    bounces: int = 5              # fixed indirect bounces (ref code.js:1829)
    exposure: float = 1.8         # tonemap scale (ref code.cl:1382)
    shadow_eps: float = 1e-3      # shadow-ray origin offset (ref code.cl:659)
    ambient: float = 0.2          # Assign08 direct-lighting ambient (ref Assign08 code.cl:929)
    two_sided_triangles: bool = False  # ref default single-sided (code.cl:257)
    russian_roulette: bool = False     # extension (BASELINE.json config 5)
    rr_start_depth: int = 2
    normalize_emitter: bool = True     # ref lightRender normalizes irradiance (code.cl:617)
    replicate_stale_poi: bool = False  # bug-compat: re-shade stale POI after escaped bounce
    use_grid: bool = False             # uniform-grid DDA vs brute-force matmul path
    n_slabs: int | tuple = 1           # scene grid resolution (ref code.js:399);
                                       # int = cubic, (nx, ny, nz) = per axis
                                       # ((n, 1, 1) = Assign06 1-D slabs)
    ray_chunk: int = 1 << 17           # rays per compute tile in chunked ops
    obj_chunk: int = 256               # objects per chunk in brute-force scan
                                       # (fastest on v5e at 1k-object scenes:
                                       # 19.5 ms/Mray vs 20.0 @512, 23.5 @1024)
    use_pallas: bool = False           # fused Pallas closest-hit kernels
    use_megakernel: bool = False       # whole-pass fused Pallas kernel
                                       # (fwd + custom-VJP bwd; see render/mega.py)
    mega_grad_wrt: tuple = ("par", "sph", "tri", "mat", "lig")
                                       # parameter groups the differentiable
                                       # megakernel returns real cotangents
                                       # for; restrict (e.g. ("sph","mat") =
                                       # BASELINE's geometry+albedo) to skip
                                       # unneeded transpose work
    mega_bwd_sublanes: int = 0         # backward kernel tile height (must
                                       # divide the forward's 32). 0 = auto:
                                       # 8 for the champion (cell) backward
                                       # — smaller tiles give tighter
                                       # champion-chunk ranges (measured
                                       # +3.5% teapot train) — 32 otherwise
    mega_bwd_impl: str = "auto"        # which backward the megakernel VJP
                                       # runs: "cell" (champion-recording
                                       # cell-marching backward — the
                                       # forward records champion rows +
                                       # occlusion bits, the backward is
                                       # gather + shading VJP + scatter,
                                       # no object sweep), "pallas" (fused
                                       # recompute kernel — fastest for
                                       # unrolled cornell-class tables),
                                       # "xla" (dense value-level sweep
                                       # transpose — the oracle route).
                                       # "auto": cell past the unroll
                                       # budget / grid mode, else pallas.
                                       # cell/xla replay draws from a
                                       # threefry u-planes tensor, so the
                                       # forward consumes the same planes.
    mega_edge_bandwidth: float = 0.0   # > 0: the megakernel VJP's backward
                                       # differentiates the EDGE-AWARE soft
                                       # program (sigmoid silhouette
                                       # coverage + softmin depth + soft
                                       # shadow transmittance) instead of
                                       # the hard champion program —
                                       # visibility gradients at
                                       # silhouettes become real. Forward
                                       # stays the hard fused kernel.
                                       # Scene-unit silhouette width;
                                       # ~1e-2 x scene scale is a good
                                       # start (see diff/ docs).
    mega_edge_tau: float = 0.0         # softmin depth temperature for the
                                       # edge-aware backward (defaults to
                                       # mega_edge_bandwidth when 0)
    mega_block: int = 0                # megakernel pixel-block side (e.g.
                                       # 64): ray tiles map to square pixel
                                       # blocks instead of row-major strips,
                                       # so tile-level culling (grid cells /
                                       # stream chunks) sees compact
                                       # frustums. 0 = row-major. Requires
                                       # width % block == height % block
                                       # == 0; the host unpermutes images.
    seed: int = 1234

    @property
    def n_pixels(self) -> int:
        return self.width * self.height

    @property
    def total_rays(self) -> int:
        return self.width * self.height * self.spp
