from .kv_cache import KVCacheConfig, PageAllocator, alloc_kv_pages  # noqa: F401
from .attention import (  # noqa: F401
    AttnMetadata,
    paged_attention_decode,
    ragged_prefill_attention,
    write_kv_decode,
    write_kv_prefill,
)
from .norms import rms_norm, layer_norm  # noqa: F401
from .rope import apply_rope, rope_frequencies  # noqa: F401
