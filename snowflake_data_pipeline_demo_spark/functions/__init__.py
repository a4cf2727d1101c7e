from .scalars import iff, md5_mask, dateadd, timestampdiff, date_trunc_sf, to_date_auto
from .variant import object_construct_json, variant_get, extract_variant, parse_json_path

__all__ = [
    "iff", "md5_mask", "dateadd", "timestampdiff", "date_trunc_sf", "to_date_auto",
    "object_construct_json", "variant_get", "extract_variant", "parse_json_path",
]
