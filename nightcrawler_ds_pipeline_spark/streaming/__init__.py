from nightcrawler_ds_pipeline_spark.streaming.image_ingest import (
    streaming_image_ingest,
)
from nightcrawler_ds_pipeline_spark.streaming.politeness_stream import (
    streaming_token_bucket_dequeue,
)

__all__ = ["streaming_image_ingest", "streaming_token_bucket_dequeue"]
