from .readers import (
    load_csv,
    register_tables,
    load_evolving_table,
    load_table,
    normalize_columns,
    select_dtypes,
    stamp_arrival_order,
)
from .writers import write_parquet
from .wav import wav_decode, wav_decoder, wav_encode
from .multimodal import (
    decode_media,
    real_decoder,
    extract_media_features,
    sample_frames,
    set_decoder,
    set_feature_extractor,
    with_binary_payload,
)

__all__ = [
    "load_csv",
    "register_tables",
    "load_evolving_table",
    "load_table",
    "normalize_columns",
    "select_dtypes",
    "stamp_arrival_order",
    "write_parquet",
    "decode_media",
    "real_decoder",
    "wav_decode",
    "wav_decoder",
    "wav_encode",
    "extract_media_features",
    "sample_frames",
    "set_decoder",
    "set_feature_extractor",
    "with_binary_payload",
]
