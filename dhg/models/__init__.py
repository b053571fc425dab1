from dhg.models.denoiser import DiffusionModel  # noqa: F401
from dhg.models.text_style import TextStyleEncoder  # noqa: F401
from dhg.models.style_extractor import StyleExtractor  # noqa: F401
