from osm_addr_bot_spark.state.checkpoint import Checkpoint, StageRunner

__all__ = ["Checkpoint", "StageRunner"]
