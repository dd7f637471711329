"""tts_king_tpu.train"""
