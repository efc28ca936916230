from .exprs import (  # noqa: F401
    coalesce_chain,
    epoch_seconds,
    hierarchy_join,
    map_channel,
    map_direction,
    seconds_between,
    truncate_ms,
)
