from recombiner_tpu.models.gaussian import (  # noqa: F401
    Gaussian,
    NaturalGaussian,
    gaussian_log_prob,
    inverse_scale_transform,
    kl_gaussian,
    kl_posterior_prior,
    scale_transform,
)
from recombiner_tpu.models.inr import (  # noqa: F401
    init_linear_transform,
    inr_forward,
    latent_to_weights,
    slice_layer,
)
from recombiner_tpu.models.mappings import (  # noqa: F401
    expand_level,
    lpe_to_pe,
    sample_hierarchical_latents,
)
from recombiner_tpu.models.upsample import apply_upsample, init_upsample_params  # noqa: F401
