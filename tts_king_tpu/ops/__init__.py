"""tts_king_tpu.ops"""
