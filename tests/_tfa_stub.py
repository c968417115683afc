"""Minimal tensorflow_addons stub so the reference zoos import in tests
(tfa is not installed here; gcvit only uses AdaptiveAveragePooling2D(1))."""
import sys
import types


def install():
    if "tensorflow_addons" in sys.modules:
        return
    import tensorflow as tf

    tfa = types.ModuleType("tensorflow_addons")
    layers_mod = types.ModuleType("tensorflow_addons.layers")

    class AdaptiveAveragePooling2D(tf.keras.layers.Layer):
        def __init__(self, output_size, **kw):
            super().__init__(**kw)
            self.output_size = output_size

        def call(self, x):  # only output_size=1 is used by the reference
            return tf.reduce_mean(x, axis=[1, 2], keepdims=True)

    layers_mod.AdaptiveAveragePooling2D = AdaptiveAveragePooling2D
    layers_mod.GroupNormalization = tf.keras.layers.GroupNormalization
    tfa.layers = layers_mod
    image_mod = types.ModuleType("tensorflow_addons.image")
    tfa.image = image_mod
    sys.modules["tensorflow_addons"] = tfa
    sys.modules["tensorflow_addons.layers"] = layers_mod
    sys.modules["tensorflow_addons.image"] = image_mod

    # empty stubs for heavy optional deps pulled in by the kecam import chain
    for name in ("tensorflow_datasets", "pycocotools", "pycocotools.coco"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
