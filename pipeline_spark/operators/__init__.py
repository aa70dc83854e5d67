"""Transform modules (registration side effects on import)."""

from pipeline_spark.operators import (  # noqa: F401
    filter as _filter,
    select as _select,
    partition as _partition,
    union as _union,
    aggregation as _aggregation,
    beamsql as _beamsql,
    lookup as _lookup,
    limit as _limit,
    unnest as _unnest,
    compare as _compare,
    reshuffle as _reshuffle,
    deserialize as _deserialize,
    tokenize as _tokenize,
    dedup as _dedup,
    similarity as _similarity,
    textstats as _textstats,
    multimodal as _multimodal,
    http as _http,
    crypto as _crypto,
    ml as _ml,
)
