"""Helpers to load the PyTorch reference (read-only at /root/reference) for
golden-fixture parity tests. The reference's RNG is not portable to JAX, so
tests inject torch-generated noise into both implementations
(SURVEY.md §4 item 1).

inference.py in the reference imports torchaudio/torchcodec/huggingface_hub,
which are absent here — we stub them before import since tests only use its
pure-CPU helpers (tokenizer, PCA, flattening point, samplers).
"""
import sys
import types

REFERENCE_PATH = "/root/reference"


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def load_reference_model_module():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import model as ref_model  # noqa

    return ref_model


def load_reference_autoencoder_module():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import autoencoder as ref_ae  # noqa

    return ref_ae


def load_reference_inference_module():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    # stub out unavailable deps used only by loaders / audio io
    _stub("torchaudio", functional=types.SimpleNamespace(resample=None), save=None)
    tc = _stub("torchcodec")
    dec = _stub("torchcodec.decoders", AudioDecoder=object)
    tc.decoders = dec
    _stub("huggingface_hub", hf_hub_download=None)
    import inference as ref_inference  # noqa

    return ref_inference


def build_torch_dit(cfg, seed=0):
    """Construct the reference EchoDiT with our DiTConfig's hyperparameters
    (reference: inference.py:22-42 for the mapping), randomly initialized."""
    import torch

    ref_model = load_reference_model_module()
    torch.manual_seed(seed)
    m = ref_model.EchoDiT(
        latent_size=cfg.latent_size,
        model_size=cfg.model_size,
        num_layers=cfg.num_layers,
        num_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        norm_eps=cfg.norm_eps,
        text_vocab_size=cfg.text_vocab_size,
        text_model_size=cfg.text_model_size,
        text_num_layers=cfg.text_num_layers,
        text_num_heads=cfg.text_num_heads,
        text_intermediate_size=cfg.text_intermediate_size,
        speaker_patch_size=cfg.speaker_patch_size,
        speaker_model_size=cfg.speaker_model_size,
        speaker_num_layers=cfg.speaker_num_layers,
        speaker_num_heads=cfg.speaker_num_heads,
        speaker_intermediate_size=cfg.speaker_intermediate_size,
        timestep_embed_size=cfg.timestep_embed_size,
        adaln_rank=cfg.adaln_rank,
    )
    # randomize norm weights so parity isn't trivially testing ones
    with torch.no_grad():
        for name, p in m.named_parameters():
            if "norm" in name and p.dim() <= 2 and p.min() == 1 and p.max() == 1:
                p.add_(0.1 * torch.randn_like(p))
    return m.eval()
