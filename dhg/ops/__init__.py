from dhg.ops.basic import (  # noqa: F401
    AffineTransformLayer,
    FFN,
    layer_norm,
    create_padding_mask,
    reshape_up,
    reshape_down,
)
from dhg.ops.attention import MultiHeadAttention, pos_embeddings  # noqa: F401
from dhg.ops.conv import ConvBlock, avg_pool_1d, upsample_nearest_1d  # noqa: F401
