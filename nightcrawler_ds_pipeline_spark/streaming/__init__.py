from nightcrawler_ds_pipeline_spark.streaming.politeness_stream import (
    streaming_token_bucket_dequeue,
)

__all__ = ["streaming_token_bucket_dequeue"]
