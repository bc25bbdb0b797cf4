"""Chat template coverage for every registered model (chat.cc per-family
prompt wrappers)."""

from tinychatengine_tpu.core.config import MODEL_REGISTRY
from tinychatengine_tpu.generation.chat_templates import template_for


def test_every_registry_model_has_a_template():
    for name, cfg in MODEL_REGISTRY.items():
        if cfg.family == "clip":
            continue
        t = template_for(name)
        assert "{input}" in t.first, name
        assert "{input}" in t.next, name
        first = t.first.replace("{image}", "").format(input="hi")
        assert "hi" in first, name


def test_vlm_templates_carry_image_slot():
    for name in ("llava_7b", "vila_7b", "vila_13b"):
        t = template_for(name)
        assert "{image}" in t.first, name
