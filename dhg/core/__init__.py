from dhg.core.schedule import get_beta_set, get_alpha_set, sample_alphas  # noqa: F401
from dhg.core.losses import diffusion_loss  # noqa: F401
