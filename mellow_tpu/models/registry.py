"""Model registry (reference: mellow/model/model.py:3-7 `get_model_class`
mapping 'Mellow' to the model class; here a name maps to the functional
bundle for that model family)."""

from __future__ import annotations

from types import SimpleNamespace


def get_audio_encoder(name: str = "HTSAT") -> SimpleNamespace:
    """Audio-encoder factory (reference: mellow/model/audio.py:3-7)."""
    if name != "HTSAT":
        raise ValueError(
            f"The audio encoder {name} is incorrect or not supported"
        )
    from mellow_tpu.models import htsat as h

    return SimpleNamespace(
        encode_audio=h.encode_audio,
        htsat_embedding=h.htsat_embedding,
        htsat_embedding_long=h.htsat_embedding_long,
        htsat_embedding_infer_mode=h.htsat_embedding_infer_mode,
        projection=h.projection,
        downsample_tokens=h.downsample_tokens,
    )


def get_model(model_type: str = "Mellow") -> SimpleNamespace:
    if model_type.lower() != "mellow":
        raise ValueError(
            f"The model {model_type} is not supported. Supported: ['Mellow']"
        )
    from mellow_tpu.models import mellow as m

    return SimpleNamespace(
        init_params=m.init_params,
        generate_tokens=m.generate_tokens,
        encode_and_prefix=m.encode_and_prefix,
        build_prefix=m.build_prefix,
        forward_train=m.forward_train,
        count_params=m.count_params,
    )
