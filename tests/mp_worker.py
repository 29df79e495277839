"""Worker for tests/test_multiprocess.py: one JAX process of a 2-process
CPU 'multi-host' run (the DCN-path test VERDICT round 1 asked for).

Run as:  python tests/mp_worker.py <pid> <nproc> <port> <outdir>

Each process gets 2 virtual CPU devices (4 global), initializes
jax.distributed through parallel/launch.py's env-gated path, and drives a
mini train + encode through the exact branches that only execute when
process_count() > 1: shard_rows_global (make_array_from_process_local_data),
fetch_global (process_allgather), mesh._place (make_array_from_callback),
and is_primary host-0 write gating. Writes a JSON result for the parent to
assert on.
"""

import json
import os
import sys


def main() -> None:
    pid, nproc, port, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    ).strip()
    os.environ["RECOMBINER_TPU_MULTIHOST"] = "1"
    os.environ["RECOMBINER_TPU_COORDINATOR"] = f"localhost:{port}"
    os.environ["RECOMBINER_TPU_NUM_PROCESSES"] = str(nproc)
    os.environ["RECOMBINER_TPU_PROCESS_ID"] = str(pid)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_prng_impl", "threefry2x32")

    import numpy as np

    from recombiner_tpu.parallel.launch import (
        fetch_global,
        is_primary,
        maybe_initialize_distributed,
        shard_rows_global,
    )

    assert maybe_initialize_distributed(), "env-gated initialize did not run"
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc, jax.devices()

    import jax.numpy as jnp

    from recombiner_tpu.coding.encoder import encode_step, init_codec, optimize
    from recombiner_tpu.config import TINY
    from recombiner_tpu.data.synthetic import synthetic_dataset
    from recombiner_tpu.parallel.mesh import make_mesh, shard_rows
    from recombiner_tpu.priors.artifact import build_prior_artifact
    from recombiner_tpu.priors.trainer import em_train

    cfg = TINY
    R = 4  # one row per global device
    X, Y = synthetic_dataset(cfg, R, seed=20)
    mesh = make_mesh()  # all 4 global devices

    # each "host" holds only its half of the rows (the real multi-host data
    # pipeline contract); shard_rows_global assembles the global array
    lo, hi = pid * (R // nproc), (pid + 1) * (R // nproc)
    Xg = shard_rows_global(X[lo:hi], mesh)
    Yg = shard_rows_global(Y[lo:hi], mesh)
    assert not Xg.is_fully_addressable  # genuinely multi-process

    # fetch_global must reassemble the full value on every process
    np.testing.assert_allclose(fetch_global(Xg), X, rtol=0, atol=0)

    # mini EM train over the global arrays (fresh state -> the em_train
    # mesh-placement branch; collectives for shared-mapping grads + M-step)
    res = em_train(
        jax.random.key(0), cfg, Xg, Yg, max_bitrate=4.0,
        n_em_iters=2, first_epochs=8, later_epochs=4, lr=2e-3,
    )
    assert np.isfinite(res.elbo_history[-1]["mse"])

    # mini encode: codec/state replicated+row-sharded via mesh.shard_rows'
    # multi-process _place branch, then optimize + one coding step
    art = build_prior_artifact(res.state, res.priors, res.kl_beta, cfg)
    codec, state = init_codec(art, n_rows=R)
    codec = shard_rows(codec, mesh)
    state = shard_rows(state, mesh)
    state, _ = optimize(codec, state, Xg, Yg, jax.random.key(1), cfg=cfg,
                        n_epochs=6, lr=2e-3, sample_size=2,
                        return_opt_state=True)
    state = encode_step(codec, state, "w")
    indices = fetch_global(state.w.indices)
    assert indices.shape == (R, codec.w.n_groups)

    # host-0 write gating: every process reaches this point, one file lands
    if is_primary():
        with open(os.path.join(outdir, "primary_output.json"), "w") as f:
            json.dump({"writer": pid}, f)

    with open(os.path.join(outdir, f"result_{pid}.json"), "w") as f:
        json.dump(
            {
                "pid": pid,
                "process_count": jax.process_count(),
                "mse": float(res.elbo_history[-1]["mse"]),
                "indices_sum": int(indices.astype(np.int64).sum()),
                "coded_rows": int(fetch_global(state.w.compressed).sum()),
            },
            f,
        )


if __name__ == "__main__":
    main()
