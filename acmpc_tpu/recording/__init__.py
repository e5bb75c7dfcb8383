from acmpc_tpu.recording.recorder import DataRecorder

__all__ = ["DataRecorder"]
