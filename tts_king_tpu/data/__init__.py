"""tts_king_tpu.data"""
