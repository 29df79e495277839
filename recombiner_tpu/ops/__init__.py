from recombiner_tpu.ops.blocked_inr import inr_forward_blocked  # noqa: F401
