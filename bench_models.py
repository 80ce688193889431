#!/usr/bin/env python
"""Secondary benchmarks: the full BASELINE.json config set.

Unlike ``bench.py`` (the driver's single-line headline metric), this prints
one JSON line per model config so per-model throughput/latency can be
tracked:

Windows are 100 pipelined ticks: each window pays one ~25 ms relay
sync, so short windows underreport throughput by RTT/ticks per tick.

* double-integrator h=20 (LTI shared-factorization path)
* cart-pole swing-up h=20 (nonlinear, per-scenario QPs)
* unicycle + obstacle half-spaces h=50 (nonlinear)
* quadrotor-12D h=100 (nonlinear, long horizon)

Env: OCP_BENCH_MODELS (comma list), OCP_BENCH_NL_BATCH, OCP_BENCH_TICKS.
"""

import json
import os
import time

import numpy as np


def bench_model(name, build_fn, frames, refs, batch, ticks, warmup=2):
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

    from optimal_control_problem_tpu.parallel import BatchedSolver

    ocp = build_fn()
    batched = BatchedSolver(ocp)
    state = batched.init_state(batch)
    t0 = time.perf_counter()
    for _ in range(warmup):
        trajs, objs, state = batched.solve(frames, refs, state)
    jax.block_until_ready(trajs)
    compile_s = time.perf_counter() - t0

    # Three pipelined windows; report the MEDIAN (the relay occasionally
    # produces physically impossible fast/slow outlier windows, so a
    # best-of pick is not trustworthy for the committed artifact).
    t_windows = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ticks):
            trajs, objs, state = batched.solve(frames, refs, state)
        jax.block_until_ready(trajs)
        t_windows.append((time.perf_counter() - t0) / ticks)
    per_tick = float(np.median(t_windows))
    finite = bool(np.isfinite(np.asarray(trajs)).all())

    # Deployment-shaped step latency at small batch, two views:
    # * step_ms — pipelined ticks (state-dependent chain, one sync at the
    #   end): pure device compute per MPC step, what an ON-HOST controller
    #   pays; compare against BASELINE.md's 5 ms budget.  Median of 3
    #   windows (the relay has slow phases AND impossible-fast glitches).
    # * p50/p99_sync_ms — blocking every tick: upper bound that includes
    #   this session's ~25 ms relay round trip; on-host deployments don't
    #   pay it, but it bounds worst-case remote serving.
    lat_batch = min(batch, int(os.environ.get("OCP_BENCH_LAT_BATCH", 8)))
    lat_ticks = int(os.environ.get("OCP_BENCH_LAT_TICKS", 100))
    lstate = batched.init_state(lat_batch)
    lf, lr = frames[:lat_batch], refs[:lat_batch]
    for _ in range(max(warmup, 3)):
        ltr, _, lstate = batched.solve(lf, lr, lstate)
    jax.block_until_ready(ltr)
    windows = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(lat_ticks):
            ltr, _, lstate = batched.solve(lf, lr, lstate)
        jax.block_until_ready(ltr)
        windows.append(time.perf_counter() - t0)
    step_ms = float(np.median(windows)) / lat_ticks * 1e3
    lats = []
    for _ in range(lat_ticks):
        t0 = time.perf_counter()
        ltr, _, lstate = batched.solve(lf, lr, lstate)
        jax.block_until_ready(ltr)
        lats.append(time.perf_counter() - t0)
    lats = np.asarray(lats) * 1e3

    print(
        json.dumps(
            {
                "model": name,
                "batch": batch,
                "tick_ms": round(per_tick * 1e3, 3),
                "solves_per_s": round(batch / per_tick, 1),
                "latency_batch": lat_batch,
                "step_ms": round(step_ms, 3),
                "p50_sync_ms": round(float(np.percentile(lats, 50)), 3),
                "p99_sync_ms": round(float(np.percentile(lats, 99)), 3),
                "shared_system": bool(ocp.solver.shared_system),
                "finite": finite,
                "compile_s": round(compile_s, 1),
            }
        ),
        flush=True,
    )


def main():
    from optimal_control_problem_tpu.models import (
        cartpole,
        double_integrator as di,
        quadrotor,
        unicycle,
    )
    from optimal_control_problem_tpu.utils.serialization import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    which = os.environ.get(
        "OCP_BENCH_MODELS", "double_integrator,cartpole,unicycle,quadrotor"
    ).split(",")
    B_nl = int(os.environ.get("OCP_BENCH_NL_BATCH", 256))
    ticks = int(os.environ.get("OCP_BENCH_TICKS", 100))
    rng = np.random.default_rng(0)
    admm_nl = {"method": "condensed", "max_iter": 500, "adaptive_rho": True}

    if "double_integrator" in which:
        B = int(os.environ.get("OCP_BENCH_BATCH", 4096))
        frames = np.zeros((B, di.FRAME), np.float32)
        frames[:, 0:2] = rng.uniform(-1, 1, (B, 2)).astype(np.float32)
        refs = np.tile(di.reference_circle(20, 0.005)[None, :], (B, 1)).astype(
            np.float32
        )
        bench_model(
            "double_integrator_h20",
            lambda: di.build(
                di.make_config(
                    horizon=20,
                    dt=0.005,
                    alpha=0.1,
                    step_num=10,
                    formulation="reduced",
                    ADMM_settings={
                        "method": "condensed",
                        "max_iter": 1000,
                        "adaptive_rho": True,
                    },
                )
            ),
            frames,
            refs,
            B,
            ticks,
        )

    if "cartpole" in which:
        frames = np.zeros((B_nl, cartpole.FRAME), np.float32)
        frames[:, 2] = rng.uniform(-0.5, 0.5, B_nl).astype(np.float32)
        refs = np.full((B_nl, 1), np.pi, np.float32)
        bench_model(
            "cartpole_h20",
            lambda: cartpole.build(
                cartpole.make_config(
                    horizon=20,
                    dt=0.02,
                    alpha=0.3,
                    step_num=10,
                    formulation="reduced",
                    ADMM_settings=admm_nl,
                )
            ),
            frames,
            refs,
            B_nl,
            ticks,
        )

    if "cartpole_banded" in which or "cartpole" in which:
        frames = np.zeros((B_nl, cartpole.FRAME), np.float32)
        frames[:, 2] = rng.uniform(-0.5, 0.5, B_nl).astype(np.float32)
        refs = np.full((B_nl, 1), np.pi, np.float32)
        bench_model(
            "cartpole_h20_banded",
            lambda: cartpole.build(
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
                        # Warm-started steady-state QPs converge in ~2
                        # iterations; ce=2 + tick-Ruiz measured 4.43 ->
                        # 1.24 ms/tick at B=256 (round-5 _profile_cart).
                        "check_every": 2,
                        "scaling_refresh": "tick",
                    },
                ),
                stagewise=True,
            ),
            frames,
            refs,
            B_nl,
            ticks,
        )

    if "cartpole_banded_large" in which or "cartpole" in which:
        # Scaling point: the single-buffered kernel fits the whole 1024-
        # scenario batch in VMEM as one grid program (round 3 VMEM probe).
        B_l = int(os.environ.get("OCP_BENCH_NL_BATCH_LARGE", 1024))
        frames = np.zeros((B_l, cartpole.FRAME), np.float32)
        frames[:, 2] = rng.uniform(-0.5, 0.5, B_l).astype(np.float32)
        refs = np.full((B_l, 1), np.pi, np.float32)
        bench_model(
            "cartpole_h20_banded_B1024",
            lambda: cartpole.build(
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
                        # Warm-started steady-state QPs converge in ~2
                        # iterations; ce=2 + tick-Ruiz measured 4.43 ->
                        # 1.24 ms/tick at B=256 (round-5 _profile_cart).
                        "check_every": 2,
                        "scaling_refresh": "tick",
                    },
                ),
                stagewise=True,
            ),
            frames,
            refs,
            B_l,
            ticks,
        )

    if "cartpole_pallas" in which or "cartpole" in which:
        frames = np.zeros((B_nl, cartpole.FRAME), np.float32)
        frames[:, 2] = rng.uniform(-0.5, 0.5, B_nl).astype(np.float32)
        refs = np.full((B_nl, 1), np.pi, np.float32)
        bench_model(
            "cartpole_h20_pallas",
            lambda: cartpole.build(
                cartpole.make_config(
                    horizon=20,
                    dt=0.02,
                    alpha=0.3,
                    step_num=10,
                    formulation="reduced",
                    ADMM_settings={
                        "method": "condensed",
                        "max_iter": 500,
                        "adaptive_rho": False,
                        "backend": "pallas",
                        "rho": 0.05,
                    },
                )
            ),
            frames,
            refs,
            B_nl,
            ticks,
        )

    if "unicycle" in which:
        frames = np.zeros((B_nl, unicycle.FRAME), np.float32)
        frames[:, 2] = rng.uniform(-0.5, 0.5, B_nl).astype(np.float32)
        refs = np.tile(
            unicycle.reference_line(50, 0.05)[None, :], (B_nl, 1)
        ).astype(np.float32)
        bench_model(
            "unicycle_h50",
            lambda: unicycle.build(
                unicycle.make_config(
                    horizon=50,
                    dt=0.05,
                    alpha=0.3,
                    step_num=10,
                    formulation="reduced",
                    ADMM_settings=admm_nl,
                ),
                halfspaces=(((0.0, 1.0), -0.5),),
            ),
            frames,
            refs,
            B_nl,
            ticks,
        )

    if "unicycle" in which:
        bench_model(
            "unicycle_h50_banded",
            lambda: unicycle.build(
                unicycle.make_config(
                    horizon=50,
                    dt=0.05,
                    alpha=0.3,
                    step_num=10,
                    formulation="reduced",
                    ADMM_settings={
                        "method": "banded",
                        "max_iter": 500,
                        "check_every": 5,  # see cartpole_banded note
                    },
                ),
                halfspaces=(((0.0, 1.0), -0.5),),
                stagewise=True,
            ),
            frames,
            refs,
            B_nl,
            ticks,
        )

    if "quadrotor" in which:
        quad_admm = {
            "method": "banded",
            "max_iter": 250,
            # Tuned fixed rho beats adaptive here (docs/TUNING.md 4b).
            "adaptive_rho": False,
            "rho": 0.05,
            # Warm-started steady-state QPs converge in ~2 iterations, and
            # the kernel iterates until the whole tile passes, so ce=2
            # stops stragglers at their actual convergence point: measured
            # 11.4 -> 6.5 ms/tick at B=64 vs ce=5 (round 5; ce=1 pays more
            # check blocks than it saves, ce=3 overshoots to 2x3 its).
            "check_every": 2,
            # Equilibrate once per tick, reuse across SQP steps
            # (ADMMSettings.scaling_refresh; round 4).
            "scaling_refresh": "tick",
        }
        for B_q in (64, 128):
            frames = np.tile(
                quadrotor.initial_state()[None, :], (B_q, 1)
            ).astype(np.float32)
            frames[:, 0:2] += rng.uniform(-0.5, 0.5, (B_q, 2)).astype(
                np.float32
            )
            refs = np.tile(
                quadrotor.reference_hover(100)[None, :], (B_q, 1)
            ).astype(np.float32)
            bench_model(
                f"quadrotor_h100_banded_B{B_q}",
                lambda: quadrotor.build(
                    quadrotor.make_config(
                        horizon=100,
                        dt=0.02,
                        alpha=0.3,
                        step_num=5,
                        formulation="reduced",
                        ADMM_settings=dict(quad_admm),
                    ),
                    stagewise=True,
                ),
                frames,
                refs,
                B_q,
                ticks,
            )


if __name__ == "__main__":
    main()
