from .layers import (  # noqa: F401
    conv1d, conv_transpose1d, snake, avg_pool1d, leaky_relu,
    init_conv1d, init_conv_transpose1d,
)
