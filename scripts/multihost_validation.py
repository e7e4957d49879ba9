"""Multi-HOST (multi-process) validation on localhost: real cross-process
collectives through the framework's own distributed path.

The single-process test suite validates sharding on an 8-virtual-device mesh
(one process). This harness validates the step that suite cannot: TWO
separate OS processes (4 virtual CPU devices each) joined via
``parallel.distributed.initialize`` (``jax.distributed.initialize`` +
gloo CPU collectives), running

  1. ``make_dp_train_step`` over a global ('data','frame') mesh whose 'data'
     axis spans the process boundary — the gradient all-reduce is a real
     cross-process collective; both processes assert the loss and updated
     params equal a full-batch single-device oracle computed locally;
  2. ``fastdvd_prior_sharded`` over a (data=1, frame=8) mesh — the circular
     ring-halo ``ppermute`` crosses the process boundary; output asserted
     against the local unsharded ``seq_circular`` oracle.

This is the closest a single machine gets to a pod: the communication path
(process-spanning global mesh + XLA collectives) is exactly what runs over
DCN on real multi-host topologies; only the transport differs (gloo here,
ICI/DCN there).

Launcher (spawns both workers, checks both OKs):
    python scripts/multihost_validation.py
Worker (internal):
    python scripts/multihost_validation.py --worker <pid> <nproc> <port>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def worker(pid: int, nproc: int, port: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from adaptivepnp_sci_tpu.parallel.distributed import global_mesh, initialize

    initialize(coordinator_address=f"localhost:{port}",
               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()

    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from adaptivepnp_sci_tpu.models.fastdvdnet import FastDVDnet
    from adaptivepnp_sci_tpu.models.ffdnet import FFDNet
    from adaptivepnp_sci_tpu.parallel.sharded import (
        fastdvd_prior_sharded,
        make_dp_train_step,
    )
    from adaptivepnp_sci_tpu.solvers.priors import fastdvd_prior

    # --- 1. DP training step: 'data' axis spans the process boundary ------
    model = FFDNet(in_nc=3, out_nc=3, nc=8, nb=3)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.float32(0.1)
    )
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(variables)

    rng = np.random.default_rng(1)  # same data in every process
    noisy = rng.random((16, 8, 8, 3), dtype=np.float32)
    clean = rng.random((16, 8, 8, 3), dtype=np.float32)
    sigma = np.full((16,), 0.1, np.float32)

    mesh = global_mesh(frame=2)  # data=4 spans both processes
    step, place = make_dp_train_step(model, optimizer, mesh)
    p1, o1, loss_sharded = step(
        *place(variables, opt_state, noisy, clean, sigma)
    )

    def loss_fn(params):
        out = model.apply(params, jnp.asarray(noisy), jnp.asarray(sigma))
        return jnp.mean((out - jnp.asarray(clean)) ** 2) / 2.0

    # local full-batch oracle (plain single-device computation per process)
    loss_single, grads = jax.value_and_grad(loss_fn)(variables)
    assert abs(float(loss_sharded) - float(loss_single)) < 1e-6, (
        float(loss_sharded), float(loss_single))
    upd, _ = optimizer.update(grads, opt_state, variables)
    want = optax.apply_updates(variables, upd)
    # params replicate over the mesh -> fully addressable, read directly
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        )
    print(f"proc {pid}: DP step matches single-device oracle "
          f"(loss {float(loss_sharded):.6f})", flush=True)

    # --- 2. ring-halo ppermute across the process boundary ----------------
    fmodel = FastDVDnet()
    fvars = fmodel.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 5, 16, 16, 3)), jnp.float32(0.1)
    )
    rgb = np.random.default_rng(0).random((8, 16, 16, 3), dtype=np.float32)
    fsig = jnp.float32(0.1)

    want_rgb = fastdvd_prior(fmodel).apply(fvars, jnp.asarray(rgb), fsig)

    hmesh = global_mesh(frame=8)  # frame axis spans both processes
    prior = fastdvd_prior_sharded(fmodel, hmesh)
    rgb_sharded = jax.device_put(
        jnp.asarray(rgb), NamedSharding(hmesh, P("frame"))
    )
    got = prior.apply(fvars, rgb_sharded, fsig)
    got_full = multihost_utils.process_allgather(got, tiled=True)
    np.testing.assert_allclose(
        np.asarray(got_full), np.asarray(want_rgb), rtol=2e-5, atol=1e-6
    )
    print(f"proc {pid}: cross-process ring-halo prior matches unsharded",
          flush=True)

    # --- 3. full two-stage ADMM with the process-spanning prior -----------
    from adaptivepnp_sci_tpu.data.synthetic import make_scene
    from adaptivepnp_sci_tpu.solvers import ADMMConfig, two_stage_admm

    scene = make_scene(b=8, h=16, w=16, seed=3)
    config = ADMMConfig(sigma=(12 / 255,), iters=(3,), denoiser="fastdvd")
    res = two_stage_admm(
        scene.meas, scene.mask, config, prior=prior, variables=fvars,
        orig_bayer=scene.orig_bayer,
    )
    want_res = two_stage_admm(
        scene.meas, scene.mask, config, prior=fastdvd_prior(fmodel),
        variables=fvars, orig_bayer=scene.orig_bayer,
    )
    got_x = (np.asarray(res.x_bayer) if res.x_bayer.is_fully_addressable
             else np.asarray(
                 multihost_utils.process_allgather(res.x_bayer, tiled=True)))
    np.testing.assert_allclose(
        got_x, np.asarray(want_res.x_bayer), rtol=2e-5, atol=1e-5
    )
    print(f"proc {pid}: multi-process two-stage ADMM matches single-device "
          f"({float(res.psnr_per_frame.mean()):.2f} dB)", flush=True)
    print(f"proc {pid}: OK", flush=True)


def _launch_once(nproc: int, port: int, timeout_s: int) -> tuple[int, bool]:
    """Run one 2-process attempt. Returns (n_ok, coordinator_bind_failed)."""
    import subprocess
    import tempfile

    procs, logs = [], []
    for i in range(nproc):
        log = tempfile.NamedTemporaryFile(  # noqa: SIM115 — read back below
            mode="w+", suffix=f".worker{i}.log", delete=False
        )
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             str(i), str(nproc), str(port)],
            stdout=log, stderr=subprocess.STDOUT,
            start_new_session=True,  # own process group: killable as a unit
        ))
    ok, bind_failed = 0, False
    try:
        for p in procs:
            try:
                p.wait(timeout=timeout_s)
            except subprocess.TimeoutExpired:
                pass  # killed in finally; counted as failed below
    finally:
        import signal

        for p in procs:
            if p.poll() is None:
                try:
                    os.killpg(p.pid, signal.SIGKILL)
                except OSError:
                    pass
                p.wait()
    for i, (p, log) in enumerate(zip(procs, logs)):
        log.seek(0)
        out = log.read()
        log.close()
        os.unlink(log.name)
        failed = p.returncode != 0 or f"proc {i}: OK" not in out
        # show enough context to diagnose a worker failure from CI logs
        tail = "\n".join(out.strip().splitlines()[-(40 if failed else 6):])
        print(f"--- worker {i} (rc={p.returncode}) ---\n{tail}", flush=True)
        if not failed:
            ok += 1
        elif "Failed to bind" in out or "Address already in use" in out:
            bind_failed = True
    return ok, bind_failed


def launch(nproc: int = 2, timeout_s: int = 420) -> int:
    import socket

    for attempt in range(2):  # retry once on a coordinator-port race
        with socket.socket() as s:  # pick a free port
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        ok, bind_failed = _launch_once(nproc, port, timeout_s)
        if ok == nproc:
            print(f"multihost validation: {nproc} processes OK")
            return 0
        if not bind_failed:
            break
        print(f"coordinator port {port} raced; retrying", flush=True)
    print(f"multihost validation FAILED ({ok}/{nproc} OK)")
    return 1


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
    else:
        sys.exit(launch())
