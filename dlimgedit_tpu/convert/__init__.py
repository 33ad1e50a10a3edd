"""Weight converters: external checkpoint formats -> dlimgedit_tpu pytrees.

Converters run offline (like the reference's script/export_models.py) and
write .npz bundles into the model directory consumed by the runtime.
"""
