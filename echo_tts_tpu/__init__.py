"""echo_tts_tpu — TPU-native Echo-TTS framework.

Public API (lazy-imported to keep `import echo_tts_tpu` light):

    from echo_tts_tpu import (
        DiTConfig, AEConfig, SamplerConfig, PipelineConfig, MeshConfig,
        EchoTTS, sample_pipeline,
        load_dit_from_safetensors, load_ae_from_safetensors, PCAState,
    )
"""
__version__ = "0.1.0"

_LAZY = {
    "DiTConfig": "echo_tts_tpu.core.config",
    "AEConfig": "echo_tts_tpu.core.config",
    "SamplerConfig": "echo_tts_tpu.core.config",
    "PipelineConfig": "echo_tts_tpu.core.config",
    "MeshConfig": "echo_tts_tpu.core.config",
    "EchoTTS": "echo_tts_tpu.pipeline.pipeline",
    "sample_pipeline": "echo_tts_tpu.pipeline.pipeline",
    "load_dit_from_safetensors": "echo_tts_tpu.checkpoints.io",
    "load_ae_from_safetensors": "echo_tts_tpu.checkpoints.io",
    "PCAState": "echo_tts_tpu.models.pca",
    "sample_euler_cfg_independent_guidances": "echo_tts_tpu.sampling.euler_cfg",
    "sample_blockwise_euler_cfg_independent_guidances": "echo_tts_tpu.sampling.blockwise",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod = importlib.import_module(_LAZY[name])
        return getattr(mod, name)
    raise AttributeError(f"module 'echo_tts_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(list(_LAZY) + ["__version__"])
