#!/usr/bin/env python
"""Benchmark harness: batched horizon-20 SQP solves/s per chip.

Canonical problem (BASELINE.md): double-integrator tracking, dt=0.005,
horizon=20, SQP step_num=10 with damped alpha (reference SQP_settings,
readme.md:60-61), ADMM inner QP at eps 1e-3 (SQPOptimizationSolver.cpp:83-85),
4096 scenarios batched on one chip (BASELINE.json config 5).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
``vs_baseline`` is value / 1e4 (the >=1e4 solves/s/chip target; the reference
itself publishes no numbers — BASELINE.json ``published: {}``).

Extras (round 3):
* ``windows`` / ``median_solves_per_s`` — every throughput window, so
  cross-round deltas are interpretable against the session relay's spread;
* ``achieved_tflops`` / ``mfu_*`` — roofline accounting for the headline
  path (see docs/PERFORMANCE.md "Roofline");
* ``pallas_*`` — a second measured config (cart-pole h20, batch-native
  banded path) whose hot loop is the fused Pallas chunk kernel
  (ops/banded_kernel.py), so the driver-captured artifact contains real-TPU
  Pallas numbers.  Set OCP_BENCH_PALLAS=0 to skip.
"""

import json
import os
import sys
import time

import numpy as np


def _log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


# Per-chip peak: TPU v5e MXU ~ 394 Tflop/s bf16.  The solver core runs
# f32 at HIGHEST matmul precision = 6 bf16 MXU passes per f32 multiply
# (3 cross products x 2 passes), so the f32-highest effective peak is
# peak_bf16 / 6 (docs/PERFORMANCE.md "What made the difference" item 1).
PEAK_BF16_TFLOPS = float(os.environ.get("OCP_PEAK_TFLOPS", 394.0))


def _headline_flops_per_tick(batch, n, m, qp_iters, check_every):
    """f32 matmul flops of one batched tick on the shared-factorization
    condensed path (admm_batched._admm_iterate_impl):

    * per ADMM iteration: rhs (B,m)@(m,n), x (B,n)@(n,n), z (B,n)@(n,m)
      -> 2B(n^2 + 2nm);
    * per check block (every ``check_every`` iters): residual matvecs
      Ax/Px/Aty -> 2B(n^2 + 2nm), and the certificate matvecs
      A^T dy / P dx / A dx -> ~2B(n^2 + 2nm) again.

    ``qp_iters`` = measured ADMM iterations per SQP step (array).
    Warm-start z-init and the SQP-layer matvecs are <1% and ignored.
    """
    per_iter = 2.0 * batch * (n * n + 2 * n * m)
    total_iters = float(np.sum(qp_iters))
    checks = total_iters / max(check_every, 1)
    return per_iter * (total_iters + 2.0 * checks)


def measure_windows(solve, state, frames, refs, ticks, n_windows):
    """Pipelined throughput windows (ticks chained by the state data
    dependency; one device sync per window)."""
    import jax

    times = []
    for widx in range(n_windows):
        t0 = time.perf_counter()
        for _ in range(ticks):
            trajs, objs, state = solve(frames, refs, state)
        jax.block_until_ready(trajs)
        times.append(time.perf_counter() - t0)
        _log(
            f"throughput window {widx}: "
            f"{frames.shape[0] * ticks / times[-1]:.0f} solves/s"
        )
    return times, state


def main():
    batch = int(os.environ.get("OCP_BENCH_BATCH", 4096))
    ticks = int(os.environ.get("OCP_BENCH_TICKS", 100))
    warmup = int(os.environ.get("OCP_BENCH_WARMUP", 3))

    import jax

    # Register a CPU device alongside the accelerator so construction-time
    # probe compiles stay off the (potentially slow) accelerator compile
    # path; harmless when already CPU-only or when platforms are on auto.
    try:
        cur = jax.config.jax_platforms
        if cur and "cpu" not in cur.split(","):
            jax.config.update("jax_platforms", f"{cur},cpu")
            from jax.extend import backend as _jb

            _jb.clear_backends()
    except Exception:
        pass

    from optimal_control_problem_tpu.models import double_integrator as di
    from optimal_control_problem_tpu.parallel import BatchedSolver
    from optimal_control_problem_tpu.utils.serialization import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    H, dt = 20, 0.005
    cfg = di.make_config(
        horizon=H,
        dt=dt,
        solve_method="TPU_SQP",
        alpha=0.1,
        step_num=10,
        formulation="reduced",
        ADMM_settings={
            "method": "condensed",
            "eps_abs": 1e-3,
            "eps_rel": 1e-3,
            "max_iter": 1000,
            "adaptive_rho": True,
        },
    )
    _log("building problem + solver")
    ocp = di.build(cfg)
    batched = BatchedSolver(ocp)

    rng = np.random.default_rng(0)
    frames = np.zeros((batch, di.FRAME), np.float32)
    frames[:, 0:2] = rng.uniform(-1, 1, size=(batch, 2)).astype(np.float32)
    ref_one = di.reference_circle(H, dt)
    refs = np.tile(ref_one[None, :], (batch, 1)).astype(np.float32)

    state = batched.init_state(batch)

    # Warm up: compile + converge warm-start state to MPC steady state.
    _log(f"compiling/warming batch={batch} (first call may take minutes "
         "on a cold remote-compile cache)")
    t0 = time.perf_counter()
    for _ in range(warmup):
        trajs, objs, state = batched.solve(frames, refs, state)
    jax.block_until_ready(trajs)
    _log(f"warmup done in {time.perf_counter() - t0:.0f}s; measuring")

    # Throughput: pipelined ticks; the shared relay/TPU has multi-minute
    # slow phases (observed 2x spread on the identical program), so measure
    # several windows and report best (the number attached hardware
    # sustains) PLUS every window and the median for variance tracking.
    # Window length matters: every window pays one ~25 ms relay sync, so
    # N-tick windows UNDERREPORT throughput by RTT/N per tick (measured:
    # 10-tick windows cost unicycle h50 banded 2.7 ms/tick of pure sync).
    # 100 ticks makes the inflation <0.3 ms/tick.
    n_windows = int(os.environ.get("OCP_BENCH_WINDOWS", 5))
    times, state = measure_windows(
        batched.solve, state, frames, refs, ticks, n_windows
    )
    window_rates = [batch * ticks / t for t in times]
    per_tick = min(times) / ticks
    solves_per_s = batch / per_tick

    # Roofline accounting from the measured ADMM iteration counts.
    qp_iters = np.asarray(batched.last_result.qp_iters)
    flops = _headline_flops_per_tick(
        batch,
        batched.solver._qp_n,
        batched.solver._qp_m,
        qp_iters,
        ocp.solver_settings.admm.check_every,
    )
    achieved_tflops = flops / per_tick / 1e12
    mfu_f32_highest = achieved_tflops / (PEAK_BF16_TFLOPS / 6.0)
    mfu_bf16 = achieved_tflops / PEAK_BF16_TFLOPS

    # Sync per-tick latency (includes the relay round trip — upper bound).
    sync_times = []
    for _ in range(ticks):
        t0 = time.perf_counter()
        trajs, objs, state = batched.solve(frames, refs, state)
        jax.block_until_ready(trajs)
        sync_times.append(time.perf_counter() - t0)
    p50 = float(np.percentile(sync_times, 50))
    p99 = float(np.percentile(sync_times, 99))

    # Latency config: small batch, warm-started steady state (the <5ms
    # per-step budget from BASELINE.md).
    lat_batch = int(os.environ.get("OCP_BENCH_LAT_BATCH", 64))
    lat_frames = frames[:lat_batch]
    lat_refs = refs[:lat_batch]
    _log(f"compiling/warming latency config batch={lat_batch}")
    lat_state = batched.init_state(lat_batch)
    for _ in range(warmup + 2):
        lt, lo, lat_state = batched.solve(lat_frames, lat_refs, lat_state)
    jax.block_until_ready(lt)
    # Pipelined per-tick time at small batch = the device-compute latency of
    # one MPC step (what an on-host controller would see).  Best of three
    # windows, as above.
    lat_times, lat_state = measure_windows(
        batched.solve, lat_state, lat_frames, lat_refs, ticks, 3
    )
    lat_p50 = min(lat_times) / ticks

    result = {
        "metric": "batched_h20_sqp_solves_per_s_per_chip",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 1e4, 3),
        "windows": [round(r, 1) for r in window_rates],
        "median_solves_per_s": round(float(np.median(window_rates)), 1),
        "achieved_tflops": round(achieved_tflops, 2),
        "mfu_f32_highest": round(mfu_f32_highest, 4),
        "mfu_bf16": round(mfu_bf16, 4),
        "qp_iters_per_step": [int(i) for i in qp_iters],
        "p50_tick_ms": round(p50 * 1e3, 3),
        "p99_tick_ms": round(p99 * 1e3, 3),
        "p50_step_latency_ms": round(lat_p50 * 1e3, 3),
        "latency_batch": lat_batch,
        "batch": batch,
        "horizon": H,
        "sqp_iters": 10,
        "device": str(jax.devices()[0]),
    }

    # ------------------------------------------------------------------
    # Pallas-path config: cart-pole h20, batch-native banded ADMM whose
    # iteration loop is the fused batch-last Pallas chunk kernel.  Folded
    # into the same JSON line so the driver-captured artifact carries a
    # real-TPU Pallas number (VERDICT round-2 item 5).
    if os.environ.get("OCP_BENCH_PALLAS", "1") != "0":
        from optimal_control_problem_tpu.models import cartpole
        from optimal_control_problem_tpu.solvers.admm_banded_batch import (
            pick_batch_tile,
        )

        B_p = int(os.environ.get("OCP_BENCH_PALLAS_BATCH", 256))
        _log(f"pallas banded config: cartpole h20 batch={B_p}")
        ocp_p = cartpole.build(
            cartpole.make_config(
                horizon=20,
                dt=0.04,
                alpha=0.3,
                step_num=10,
                formulation="reduced",
                ADMM_settings={
                    "method": "banded",
                    "max_iter": 500,
                    "adaptive_rho": False,
                    "rho": 0.05,
                    # OSQP's check_termination knob: warm-started
                    # steady-state QPs converge in ~2 iterations and the
                    # tile iterates until ALL pass, so ce=2 stops
                    # stragglers at their actual convergence point
                    # (round-5 sweep _profile_cart.py: 4.43 -> 1.24
                    # ms/tick together with tick-Ruiz).
                    "check_every": 2,
                    # Equilibrate once per tick, reuse across SQP steps
                    # (ADMMSettings.scaling_refresh; ~0.3 ms/step here).
                    "scaling_refresh": "tick",
                },
            ),
            stagewise=True,
        )
        bp = BatchedSolver(ocp_p)
        fr_p = np.zeros((B_p, cartpole.FRAME), np.float32)
        fr_p[:, 2] = rng.uniform(-0.5, 0.5, B_p).astype(np.float32)
        refs_p = np.full((B_p, 1), np.pi, np.float32)
        st_p = bp.init_state(B_p)
        for _ in range(warmup):
            tp, _, st_p = bp.solve(fr_p, refs_p, st_p)
        jax.block_until_ready(tp)
        # Same 100-tick windows as the headline: short windows carry the
        # ~25 ms relay sync over too little compute and deflate the number
        # by ~25-35% (round-3 artifact: 10-tick windows measured 28k vs
        # 39.5k real; VERDICT round-3 item 3).
        p_ticks = int(os.environ.get("OCP_BENCH_PALLAS_TICKS", ticks))
        # One discarded full-length warmup window first: the per-call warmup
        # above converges the solver state but the first long window still
        # measured ~35% low (r04: [38.0k, 57.9k, 58.1k]) — relay/allocator
        # ramp that only a full window flushes.  Post-warmup spread is ~0.3%.
        _warm_t, st_p = measure_windows(
            bp.solve, st_p, fr_p, refs_p, p_ticks, 1
        )
        p_times, st_p = measure_windows(
            bp.solve, st_p, fr_p, refs_p, p_ticks, 3
        )
        p_rates = [B_p * p_ticks / t for t in p_times]
        ss = ocp_p._stage_structure
        tile = pick_batch_tile(
            B_p, ss.horizon, ss.frame_size,
            max(ss.dynamics_size, 1),
            max(len(np.atleast_1d(ss.stage_constraints[1])), 1),
        )
        result.update(
            {
                "pallas_metric": "cartpole_h20_banded_solves_per_s",
                "pallas_value": round(max(p_rates), 1),
                "pallas_windows": [round(r, 1) for r in p_rates],
                "pallas_batch": B_p,
                # Fused batch-native kernel in use iff a VMEM tile exists.
                "pallas_kernel_used": tile is not None,
                "pallas_batch_tile": tile,
            }
        )

    print(json.dumps(result))


if __name__ == "__main__":
    main()
