"""Engine operators (all DataFrame-native)."""
