"""Import the PyTorch reference implementation from /root/reference for
golden-value parity tests (SURVEY.md §4: "per-module allclose vs PyTorch
reference activations").

The reference depends on the `descript-audio-codec` pip package (`dac`), which
is not installed in this image; only the class *name* is needed at import time
(`/root/reference/parler_tts/dac_wrapper/modeling_dac.py:7`), so we inject a
minimal stub before importing.  Test-fixture only — never shipped.
"""

import sys
import types


def load_reference():
    if "parler_tts" in sys.modules:
        return sys.modules["parler_tts"]
    if "dac" not in sys.modules:
        dac = types.ModuleType("dac")
        dac_model = types.ModuleType("dac.model")

        import torch

        class DAC(torch.nn.Module):
            """Inert stand-in: reference DACModel wraps it but our tests
            never call encode/decode through the reference wrapper."""

            def __init__(self, n_codebooks=9, latent_dim=1024, codebook_size=1024, **kw):
                super().__init__()
                self.n_codebooks = n_codebooks
                self.latent_dim = latent_dim
                self.codebook_size = codebook_size

        dac_model.DAC = DAC
        dac.model = dac_model
        sys.modules["dac"] = dac
        sys.modules["dac.model"] = dac_model
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    # modern transformers ships its own "dac" model type; the reference's
    # AutoConfig.register("dac", ...) collides — force exist_ok during import.
    from transformers import AutoConfig, AutoModel

    orig_cfg_reg, orig_mdl_reg = AutoConfig.register, AutoModel.register

    # keep transformers' native "dac" mapping (tests build composite models
    # whose audio encoder is the HF DacModel); ignore duplicate registration
    def _cfg_reg(key, cfg, exist_ok=False):
        try:
            return orig_cfg_reg(key, cfg)
        except ValueError:
            return None

    def _mdl_reg(cfg, mdl, exist_ok=False):
        try:
            return orig_mdl_reg(cfg, mdl)
        except ValueError:
            return None

    AutoConfig.register = staticmethod(_cfg_reg)
    AutoModel.register = _mdl_reg
    try:
        import parler_tts  # noqa: E402
    finally:
        AutoConfig.register = orig_cfg_reg
        AutoModel.register = orig_mdl_reg

    # modern transformers' to_diff_dict() default-constructs the config class
    # unless it declares has_no_defaults_at_init; the reference's composite
    # config REQUIRES sub-configs at init (configuration_parler_tts.py:195-196)
    # so from_dict/from_pretrained crash without this flag (it's exactly how
    # upstream marks EncoderDecoderConfig-style composites)
    parler_tts.ParlerTTSConfig.has_no_defaults_at_init = True
    return parler_tts
