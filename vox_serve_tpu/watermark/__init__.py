from .spectral import (  # noqa: F401
    WatermarkConfig, init_watermarker, apply_watermark, detect_watermark,
    SILENTCIPHER_KEY,
)
