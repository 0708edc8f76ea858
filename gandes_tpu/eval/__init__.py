from gandes_tpu.eval.visualize import (
    display_images,
    plot_input_matrix,
    simulation_log_to_gif,
    visualize_piano_roll,
    plot_spectrogram,
)
from gandes_tpu.eval.metrics import (
    compare_distributions,
    mel_metrics,
    pitch_class_histogram,
    roll_metrics,
)
