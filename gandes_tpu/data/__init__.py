from gandes_tpu.data.audio import load_wav, save_wav, split_audio_data
