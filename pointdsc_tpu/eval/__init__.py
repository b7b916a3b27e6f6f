from pointdsc_tpu.eval.protocol import (
    PairStats,
    STATS_COLUMNS,
    pair_stats,
    aggregate_stats,
    format_scene_report,
)
