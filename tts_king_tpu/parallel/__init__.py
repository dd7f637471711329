"""tts_king_tpu.parallel"""
