from gandes_tpu.ops.pallas_mel import mel_power_pallas
