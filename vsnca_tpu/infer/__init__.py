from vsnca_tpu.infer.stylize import VideoStylizer, stylize_frames, generate_control_frames
