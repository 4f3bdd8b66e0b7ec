"""Speed-of-light (roofline) model for the LM iteration pipeline.

The reference only records per-phase wall-clock (PSBA/main.cpp:220-227);
BASELINE.md additionally demands that the Hessian-assembly and Schur-solve
stages be "measured vs speed-of-light per chip". This module is that model:
per-stage FLOP and HBM-byte counts as closed-form functions of the problem
shape (C cams, P points, O observations), evaluated against TPU peak rates,
so any measured stage/iteration time can be expressed as a fraction of its
hardware bound and classified as MXU-, HBM-, or latency/overhead-bound.

Counting conventions
  - bytes: every HBM array touched once per read/write at steady state
    (VMEM-resident reuse inside one fused kernel is NOT double-counted;
    producer->consumer pairs that XLA cannot fuse are counted twice).
  - flops_mxu: dot_general contractions only. f32 `Precision.HIGHEST` on
    the MXU decomposes each f32 multiply into 6 bf16 passes, so the
    effective peak is peak_bf16/6 (exposed as `mxu_f32_tflops`).
  - flops_vpu: elementwise/transcendental work, 1 flop per scalar op.

Stage cost formulas cover the dense3 f32 fast path (the bench
configuration, solvers/lm.py outer+inner bodies): ONE fused dense-grid
linearization kernel (ZW/V/gb planar + in-kernel U/ga partials,
ops.linearize_dense), its U/ga lane reduction, and the per-damping-retry
chain damp/inv3x3/schur_S_dense3/reduced_rhs/spd_solve(Pallas Cholesky)/
back_substitute/gain-kernel. The obs-stream kernel formulas
(linearize_pallas / residual_l2_pallas) are kept for the pairs-encoding
path but no longer appear in the dense3 iteration aggregate.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class ChipPeaks:
    """Peak rates for one chip."""

    name: str
    hbm_gbps: float           # HBM bandwidth, GB/s
    mxu_bf16_tflops: float    # MXU peak, bf16 multiply / f32 accumulate
    vpu_f32_tflops: float     # vector unit peak, f32

    @property
    def mxu_f32_tflops(self) -> float:
        # Precision.HIGHEST: 6 bf16 passes per f32 multiply
        return self.mxu_bf16_tflops / 6.0

    @property
    def mxu_f32_3pass_tflops(self) -> float:
        # Precision.HIGH: 3-pass bf16 ("bf16_6x"-style) f32 approximation
        return self.mxu_bf16_tflops / 3.0


# TPU v5e (v5 lite): 197 bf16 TFLOP/s, 819 GB/s HBM. VPU estimated at
# 8 lanes x 128 sublanes x 4 scalar units x 2 flop x ~0.94 GHz ~= 7.5
# TFLOP/s; elementwise stages below are HBM-bound long before VPU-bound,
# so the model is insensitive to this constant.
V5E = ChipPeaks(name="TPU v5e", hbm_gbps=819.0,
                mxu_bf16_tflops=197.0, vpu_f32_tflops=7.5)


@dataclass
class StageCost:
    """FLOPs and HBM bytes for one pipeline stage at a fixed shape."""

    name: str
    bytes: float = 0.0
    flops_mxu: float = 0.0
    flops_vpu: float = 0.0
    # number of data-dependent sequential steps the stage cannot avoid
    # (e.g. Cholesky columns) — a latency floor no roofline term captures
    seq_steps: int = 0

    def ms(self, peaks: ChipPeaks, mxu_precision: str = "highest") -> float:
        """Speed-of-light time: max over the three hardware terms."""
        mxu_peak = (
            peaks.mxu_f32_tflops if mxu_precision == "highest"
            else peaks.mxu_f32_3pass_tflops if mxu_precision == "high"
            else peaks.mxu_bf16_tflops
        )
        t_hbm = self.bytes / (peaks.hbm_gbps * 1e9)
        t_mxu = self.flops_mxu / (mxu_peak * 1e12)
        t_vpu = self.flops_vpu / (peaks.vpu_f32_tflops * 1e12)
        return max(t_hbm, t_mxu, t_vpu) * 1e3

    def bound(self, peaks: ChipPeaks, mxu_precision: str = "highest") -> str:
        mxu_peak = (
            peaks.mxu_f32_tflops if mxu_precision == "highest"
            else peaks.mxu_f32_3pass_tflops if mxu_precision == "high"
            else peaks.mxu_bf16_tflops
        )
        terms = {
            "hbm": self.bytes / (peaks.hbm_gbps * 1e9),
            "mxu": self.flops_mxu / (mxu_peak * 1e12),
            "vpu": self.flops_vpu / (peaks.vpu_f32_tflops * 1e12),
        }
        return max(terms, key=terms.get)


def _pad(O: int) -> int:
    T = 512 if O >= 512 else 128
    return ((O + T - 1) // T) * T


def lm_stage_costs(C: int, P: int, O: int, itemsize: int = 4,
                   pallas: bool = True) -> dict[str, StageCost]:
    """Per-stage costs of one LM iteration (dense Schur encoding).

    Stage names match benchmarks/profile_stages.py. All formulas assume the
    f32 Pallas fast path (solvers/lm.py with use_pallas()==True).
    """
    b = itemsize
    Op = _pad(O)
    costs: dict[str, StageCost] = {}

    # --- linearize_pallas: XLA-side stream gather+transpose writes 20
    # float rows + 2 int rows; the Pallas kernel reads those 22 rows and
    # writes ex(2)+A(12)+B(6)+W(18)+ptpack(12)=50 rows + camred(42C).
    # One-hot camera reduction: [42,T]x[T,C] per tile on the MXU.
    # ~500 VPU flops/obs for forward model + Jacobian + packs.
    costs["linearize_pallas"] = StageCost(
        "linearize_pallas",
        bytes=(20 * O + 22 * Op + 22 * Op + 50 * Op + 42 * C) * b,
        flops_mxu=2.0 * 42 * C * Op,
        flops_vpu=500.0 * Op,
    )
    # --- linearize_dense_pallas (want_u=True): dense (C x point-tile)
    # grid; reads the three dense obs tables + point coordinates, writes
    # the planar ZW (18C rows of P) + V pack (12 rows) + the U/ga lane
    # partials (27C rows of one 2048-lane tile); ~260 VPU flops per
    # (c, p) cell for forward model + Jacobian + packs, ~150 more for
    # the 27 A^T A / A^T ex entries
    costs["linearize_dense"] = StageCost(
        "linearize_dense",
        bytes=(3 * C * P + 3 * P + (18 * C + 12) * P + 27 * C * 2048) * b,
        flops_vpu=410.0 * C * P,
    )
    # --- U/ga lane reduction + symmetric unpack (XLA, tiny)
    costs["u_ga_reduce"] = StageCost(
        "u_ga_reduce", bytes=(2 * 27 * C * 2048 + 42 * C) * b,
        flops_vpu=27.0 * C * 2048,
    )
    # --- per-retry chain -------------------------------------------------
    costs["damp_uv"] = StageCost(
        "damp_uv", bytes=(2 * (36 * C + 9 * P)) * b, flops_vpu=6 * C + 3 * P
    )
    # closed-form cofactor inverse; the pivoted-det fallback is gated
    # behind lax.cond (inv3x3_planar3) and absent in the steady state
    costs["inv3x3"] = StageCost(
        "inv3x3", bytes=(9 * P + 9 * P) * b, flops_vpu=60.0 * P
    )
    # ZY = ZW Vinv (broadcast FMA, reads ZW+Vinv writes ZY) then the big
    # [6C,3P]x[3P,6C] MXU contraction reading ZY+ZW, writing S
    costs["schur_S_dense"] = StageCost(
        "schur_S_dense",
        bytes=(18 * C * P + 9 * P + 18 * C * P      # ZY production
               + 36 * C * P + 36 * C * C) * b,      # matmul + S
        flops_mxu=2.0 * (6 * C) * (6 * C) * (3 * P),
        flops_vpu=2.0 * 27 * C * P,                 # ZY FMAs
    )
    costs["reduced_rhs_dense"] = StageCost(
        "reduced_rhs_dense", bytes=(18 * C * P + 3 * P + 6 * C) * b,
        flops_vpu=36.0 * C * P,
    )
    # single-kernel Pallas Cholesky factor+solve on [6C,6C]
    # (ops.cholesky_pallas): trivial flops/bytes, but column-sequential —
    # the latency floor is 6C dependent steps (now inside ONE kernel, so
    # the per-step cost is a VPU op sequence, not an XLA dispatch)
    costs["spd_solve"] = StageCost(
        "spd_solve", bytes=(3 * 36 * C * C) * b,
        flops_vpu=(6 * C) ** 3 / 3.0 + 2.0 * (6 * C) ** 2,
        seq_steps=6 * C,
    )
    costs["back_substitute"] = StageCost(
        "back_substitute", bytes=(18 * C * P + 9 * P + 2 * 3 * P) * b,
        flops_vpu=36.0 * C * P + 18.0 * P,
    )
    # trial residual: stream prep (reads params, writes 20 rows) + kernel
    # (reads 21 rows, writes ex). Pairs-encoding path only.
    costs["residual_l2_pallas"] = StageCost(
        "residual_l2_pallas",
        bytes=(20 * O + 21 * Op + 2 * Op) * b,
        flops_vpu=120.0 * Op,
    )
    # dense3 trial: the gain kernel evaluates the forward model at the
    # old AND new params in one dense-grid pass (ops.residual_dense) and
    # accumulates the factored gain + trial error into one lane tile
    costs["gain_dense"] = StageCost(
        "gain_dense",
        bytes=(3 * C * P + 2 * 3 * P + 2 * 2048) * b,
        flops_vpu=130.0 * C * P,
    )
    costs["accept_bookkeeping"] = StageCost(
        "accept_bookkeeping",
        bytes=(6 * (6 * C + 3 * P)) * b,   # param-sized dots/updates only
        flops_vpu=12.0 * (C + P),
    )
    return costs


# stages that run once per outer iteration vs once per damping retry
# (the dense3 pipeline: one fused linearization kernel, no obs stream)
OUTER_STAGES = ("linearize_dense", "u_ga_reduce")
RETRY_STAGES = (
    "damp_uv", "inv3x3", "schur_S_dense", "reduced_rhs_dense", "spd_solve",
    "back_substitute", "gain_dense", "accept_bookkeeping",
)


@dataclass
class IterRoofline:
    """Speed-of-light summary for one LM iteration."""

    stage_ms: dict
    total_ms: float
    bytes: float
    flops_mxu: float
    flops_vpu: float
    bound: str
    seq_steps: int
    peaks: ChipPeaks = field(default=None)


def lm_iter_roofline(C: int, P: int, O: int, peaks: ChipPeaks = V5E,
                     retries: float = 1.0, itemsize: int = 4,
                     mxu_precision: str = "highest") -> IterRoofline:
    """Roofline for one LM iteration = outer stages + `retries` x retry
    chain. `retries`=1 is the accepted-step steady state."""
    costs = lm_stage_costs(C, P, O, itemsize=itemsize)
    stage_ms = {}
    tot_b = tot_m = tot_v = 0.0
    total = 0.0
    seq = 0
    for name in OUTER_STAGES + RETRY_STAGES:
        c = costs[name]
        k = 1.0 if name in OUTER_STAGES else retries
        stage_ms[name] = k * c.ms(peaks, mxu_precision)
        total += stage_ms[name]
        tot_b += k * c.bytes
        tot_m += k * c.flops_mxu
        tot_v += k * c.flops_vpu
        seq += int(k * c.seq_steps)
    agg = StageCost("iter", bytes=tot_b, flops_mxu=tot_m, flops_vpu=tot_v)
    return IterRoofline(
        stage_ms=stage_ms, total_ms=total, bytes=tot_b, flops_mxu=tot_m,
        flops_vpu=tot_v, bound=agg.bound(peaks, mxu_precision),
        seq_steps=seq, peaks=peaks,
    )


def summarize(C: int, P: int, O: int, measured_iter_ms: float,
              peaks: ChipPeaks = V5E, retries: float = 1.0,
              mxu_precision: str = "highest") -> dict:
    """Measured-vs-roofline summary for bench.py `extra` fields.

    mfu        : MXU utilization = useful matmul flops / peak (the LLM
                 convention; tiny here because BA iterations are
                 bandwidth/latency-dominated, not matmul-dominated)
    hbm_frac   : achieved HBM bandwidth / peak (the binding roofline)
    sol_frac   : speed-of-light fraction = roofline_ms / measured_ms.
                 Can legitimately exceed 1: the model SUMS per-stage
                 times (each stage max(hbm, mxu, vpu)), while the real
                 executable overlaps one stage's DMA with another's
                 compute, so the additive model is a mild pessimist.
    bound      : which hardware term binds the roofline ("hbm"/"mxu"/"vpu");
                 measured time above ~2x the roofline indicates the real
                 limiter is dispatch/sequential-op latency instead

    Raises ValueError on a non-positive measurement: a zero/negative
    iteration time is a broken measurement (round 4 published MFU -1.18
    because a sub-noise-floor marginal window sailed through here), and
    derived fractions from it are noise with a sign.
    """
    if not measured_iter_ms > 0.0:
        raise ValueError(
            f"measured_iter_ms={measured_iter_ms!r} is not positive: "
            "the measurement is invalid (sub-noise-floor marginal "
            "window?) — refuse it rather than derive negative "
            "mfu/hbm_frac from it"
        )
    r = lm_iter_roofline(C, P, O, peaks=peaks, retries=retries,
                         mxu_precision=mxu_precision)
    t = measured_iter_ms * 1e-3
    mxu_peak = (
        peaks.mxu_f32_tflops if mxu_precision == "highest"
        else peaks.mxu_f32_3pass_tflops if mxu_precision == "high"
        else peaks.mxu_bf16_tflops
    )
    sol = r.total_ms / measured_iter_ms
    return {
        "roofline_iter_ms": round(r.total_ms, 4),
        "sol_frac": round(sol, 4),
        "mfu": round(r.flops_mxu / t / (mxu_peak * 1e12), 6),
        "hbm_frac": round(r.bytes / t / (peaks.hbm_gbps * 1e9), 4),
        "bound": r.bound if sol > 0.5 else "latency",
        "seq_steps_per_iter": r.seq_steps,
        "chip": peaks.name,
    }
