from mraudio_tpu.text.postprocess import (
    convert_percentages_to_second,
    convert_to_absolute_time,
    moment_str_to_list,
    post_process,
    post_process_tal,
    tal_str_to_list,
)
from mraudio_tpu.text.prompts import (
    build_query_prompt,
    format_timestamp_prompt,
)

__all__ = [
    "post_process",
    "post_process_tal",
    "moment_str_to_list",
    "tal_str_to_list",
    "convert_percentages_to_second",
    "convert_to_absolute_time",
    "build_query_prompt",
    "format_timestamp_prompt",
]
