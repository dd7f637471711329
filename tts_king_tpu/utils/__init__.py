"""tts_king_tpu.utils"""
