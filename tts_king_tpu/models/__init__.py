"""tts_king_tpu.models"""
