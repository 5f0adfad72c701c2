from parler_tts_tpu.serving.batcher import BatchingEngine

__all__ = ["BatchingEngine"]
