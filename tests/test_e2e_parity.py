"""END-TO-END image->mask parity against the independent `transformers`
pipeline at REAL 1024 geometry (VERDICT r2 #3).

This closes the whole seam the reference's golden-image tier covered
(/root/reference/test/test_segmentation.cpp:101-123): uint8 image ->
resize-longest-side -> pad/normalise -> encoder -> prompt encode -> decoder
-> upsample-to-original -> threshold, compared against transformers' own
`SamProcessor` + `SamModel` + `post_process_masks` with the SAME converted
weights (random-initialised tiny ViT, but full-size pre/post: 1024 model
space, 256 low-res masks, non-square original). With the component-level
parity tests (test_sam_parity.py) this reduces the real-weight question to
weights-only risk: any checkpoint that loads produces the same masks.

Known benign numeric seams (why logits get a tolerance, masks an IoU bound):
  * transformers resizes via PIL in uint8 (quantises after resample); the
    device path resamples in f32 on the fly.
  * transformers keeps float prompt coordinates; the reference protocol
    rounds to int (segmentation.cpp:72-74). The test picks prompts whose
    scaled coordinates are exactly integral so this seam is zero here.

What is asserted, and why not IoU == 1.0: RANDOM decoder weights produce a
zero-mean mask-logit field (~3e-4 scale), so the binary mask is nearly all
decision boundary — the adversarial worst case for thresholding; tiny
resize-seam diffs lawfully flip near-zero signs. The strong, transferable
guarantees are therefore (a) logit closeness everywhere, and (b) EVERY
disagreeing pixel sits on the boundary (|reference logit| < 5% of the
field's max). With real weights — confident logits away from 0 — (a)+(b)
imply the reference's IoU>0.99 golden bound; an IoU floor is asserted here
too as a sanity net.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

import dlimgedit_tpu as dl
from dlimgedit_tpu.convert.hf_sam import convert_sam_model
from dlimgedit_tpu.models import sam as sam_lib
from dlimgedit_tpu.models.mask_decoder import MaskDecoderConfig
from dlimgedit_tpu.models.prompt_encoder import PromptEncoderConfig
from dlimgedit_tpu.models.vit_sam import SamViTConfig
from dlimgedit_tpu.runtime.environment import SamModelBundle

# 900x600 original: non-square, upscaled by 1024/900; chosen so the prompt
# coordinates below scale to exact integers (450*1024/900 = 512, etc.).
W, H = 900, 600
POINT = (450, 225)          # -> (512, 256) in 1024 model space
BOX = (225, 225, 675, 450)  # -> (256, 256, 768, 512)


def _iou(a: np.ndarray, b: np.ndarray) -> float:
    a = a.astype(bool)
    b = b.astype(bool)
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return float(inter) / float(union) if union else 1.0


@pytest.fixture(scope="module")
def image():
    """A real photograph when the reference checkout is present (truck.jpg
    1800x1200 subsampled 2x), else a deterministic synthetic scene."""
    import os

    truck = "/root/reference/test/input/truck.jpg"
    if os.path.exists(truck):
        px = dl.Image.load(truck).pixels[::2, ::2, :3]
    else:
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        px = np.stack([
            127 + 120 * np.sin(xx / 37.0),
            127 + 120 * np.cos(yy / 23.0),
            (xx + yy) % 255,
        ], axis=-1).astype(np.uint8)
        # A bright blob near the prompt point so masks are non-degenerate.
        blob = ((xx - 450) ** 2 + (yy - 225) ** 2) < 120 ** 2
        px[blob] = (240, 240, 240)
    assert px.shape == (H, W, 3)
    return np.ascontiguousarray(px)


@pytest.fixture(scope="module")
def hf():
    """Tiny random-weight HF SAM at REAL 1024 geometry (full-size pre/post:
    1024 model space, 64x64 embedding grid, 256 low-res masks)."""
    from transformers import SamConfig, SamModel, SamProcessor
    from transformers.models.sam.configuration_sam import (
        SamMaskDecoderConfig,
        SamPromptEncoderConfig,
        SamVisionConfig,
    )
    from transformers.models.sam.image_processing_sam import SamImageProcessor

    torch.manual_seed(0)
    cfg = SamConfig(
        vision_config=SamVisionConfig(
            hidden_size=32, output_channels=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=1024, patch_size=16,
            window_size=8, global_attn_indexes=[1], num_pos_feats=32,
            attn_implementation="eager",
        ),
        prompt_encoder_config=SamPromptEncoderConfig(
            hidden_size=64, image_size=1024, patch_size=16,
            mask_input_channels=8,
        ),
        mask_decoder_config=SamMaskDecoderConfig(
            hidden_size=64, num_attention_heads=2, mlp_dim=128,
            iou_head_hidden_dim=32, layer_norm_eps=1e-5,
        ),
    )
    model = SamModel(cfg)
    model.eval()
    # Amplify the IoU head so candidate scores are O(1) apart and the
    # argmax-IoU single-mask selection is framework-stable (the masks
    # themselves are threshold(sign)-invariant to any positive scaling).
    with torch.no_grad():
        model.mask_decoder.iou_prediction_head.proj_out.weight.mul_(1000.0)
        model.mask_decoder.iou_prediction_head.proj_out.bias.mul_(1000.0)
    processor = SamProcessor(SamImageProcessor())
    return model, processor


def _my_cfg() -> sam_lib.SamConfig:
    return sam_lib.SamConfig(
        variant="vit_b", image_size=1024,
        encoder_vit=SamViTConfig(
            img_size=1024, patch_size=16, embed_dim=32, depth=2,
            num_heads=2, window_size=8, global_attn_indexes=(1,),
            neck_dim=64),
        prompt=PromptEncoderConfig(
            embed_dim=64, image_embedding_size=64, input_image_size=1024,
            mask_in_chans=8),
        decoder=MaskDecoderConfig(embed_dim=64, num_heads=2, mlp_dim=128,
                                  iou_head_hidden=32),
    )


def _make_env(hf_model, preprocess_mode: str) -> dl.Environment:
    env = dl.Environment(dl.Options(
        backend=dl.Backend.cpu, allow_random_weights=True,
        compute_dtype="float32", sam_variant="vit_b", sam_image_size=1024,
        preprocess_mode=preprocess_mode))
    cfg = _my_cfg()
    params = convert_sam_model(hf_model)
    bundle = SamModelBundle(cfg, params, env.device, jnp.float32)
    got = env._sam_models["vit_b"].get_or_create(lambda: bundle)
    assert got is bundle  # seeded before any other load
    return env


@pytest.fixture(scope="module")
def hf_outputs(hf, image):
    """Official transformers pipeline: processor -> model -> post-process."""
    model, processor = hf
    inputs = processor(images=image,
                       input_points=[[[float(POINT[0]), float(POINT[1])]]],
                       return_tensors="pt")
    # The geometry seam: both sides must agree on the resized extent.
    assert inputs["reshaped_input_sizes"].tolist() == [[683, 1024]]
    with torch.no_grad():
        out = model(**inputs, multimask_output=True)
        masks = processor.image_processor.post_process_masks(
            out.pred_masks, inputs["original_sizes"],
            inputs["reshaped_input_sizes"])
        logits = processor.image_processor.post_process_masks(
            out.pred_masks, inputs["original_sizes"],
            inputs["reshaped_input_sizes"], binarize=False)
        emb = model.get_image_embeddings(inputs["pixel_values"])
    return {
        "low_res": out.pred_masks[0, 0].numpy(),      # (3, 256, 256)
        "iou": out.iou_scores[0, 0].numpy(),          # (3,)
        "masks": masks[0][0].numpy(),                 # (3, H, W) bool
        "logits": logits[0][0].numpy(),               # (3, H, W) f32
        "embedding": emb[0].numpy(),                  # (C, 64, 64)
    }


@pytest.fixture(scope="module")
def device_env(hf):
    return _make_env(hf[0], "device")


def test_e2e_embedding_parity(device_env, hf_outputs, image):
    seg = dl.Segmentation.process(
        dl.ImageView.from_array(image, dl.Channels.rgb), device_env)
    mine = np.asarray(seg.embedding[0]).transpose(2, 0, 1)  # (C, 64, 64)
    ref = hf_outputs["embedding"]
    # PIL-uint8 vs device-f32 resampling bounds the input diff at half a
    # pixel step; through the random encoder that stays small vs the
    # embedding's O(1) scale.
    assert np.abs(mine - ref).max() < 0.05 * max(1.0, np.abs(ref).max())
    corr = np.corrcoef(mine.ravel(), ref.ravel())[0, 1]
    assert corr > 0.999


def test_e2e_point_mask_parity(device_env, hf_outputs, image):
    seg = dl.Segmentation.process(
        dl.ImageView.from_array(image, dl.Channels.rgb), device_env)
    cands = seg.compute_masks(dl.Point(*POINT))
    assert len(cands) == 3
    for i, cand in enumerate(cands):
        ref_mask = hf_outputs["masks"][i]
        mine = cand.image.pixels[:, :, 0] > 0
        assert mine.shape == ref_mask.shape == (H, W)
        assert _iou(mine, ref_mask) > 0.95, f"candidate {i}"
        # The load-bearing assertion (see module docstring): any
        # disagreement must sit ON the decision boundary — the reference
        # logit at every disagreeing pixel is ~0.
        ref_logit = hf_outputs["logits"][i]
        disagree = mine != ref_mask
        if disagree.any():
            scale = np.abs(ref_logit).max()
            assert np.abs(ref_logit[disagree]).max() < 0.05 * scale, \
                f"candidate {i}: confident pixels disagree"
        assert abs(cand.accuracy - float(hf_outputs["iou"][i])) < 0.05

    # Logit closeness on the low-res masks (the decoder's raw output).
    bundle = device_env.sam_model("vit_b")
    pts = jnp.asarray([[[512.0, 256.0], [0.0, 0.0]]], jnp.float32)
    lbl = jnp.asarray([[1.0, -1.0]], jnp.float32)
    low, _ = sam_lib.decode_masks(bundle.params, bundle.cfg, seg.embedding,
                                  pts, lbl, multimask=True)
    mine_low = np.asarray(low[0, 1:4])
    ref_low = hf_outputs["low_res"]
    scale = max(1.0, np.abs(ref_low).max())
    assert np.abs(mine_low - ref_low).max() < 0.05 * scale


def test_e2e_box_mask_parity(device_env, hf, image):
    """Region prompt through both pipelines (labels 2/3 protocol vs
    transformers' input_boxes)."""
    model, processor = hf
    inputs = processor(images=image, input_boxes=[[list(map(float, BOX))]],
                       return_tensors="pt")
    with torch.no_grad():
        # Our single-mask path implements the ONNX-export `select_masks`
        # (argmax-IoU over tokens 1..3 for <=2 prompt points) — replicate
        # that selection on transformers' multimask output.
        out = model(**inputs, multimask_output=True)
        best = int(out.iou_scores[0, 0].argmax())
        # The amplified IoU head keeps this argmax framework-stable.
        scores = out.iou_scores[0, 0].numpy()
        assert np.partition(scores, -2)[-1] - np.partition(scores, -2)[-2] > 0.01
        ref = processor.image_processor.post_process_masks(
            out.pred_masks, inputs["original_sizes"],
            inputs["reshaped_input_sizes"])[0][0, best].numpy()
        ref_logit = processor.image_processor.post_process_masks(
            out.pred_masks, inputs["original_sizes"],
            inputs["reshaped_input_sizes"], binarize=False)[0][0, best].numpy()

    seg = dl.Segmentation.process(
        dl.ImageView.from_array(image, dl.Channels.rgb), device_env)
    mine = seg.compute_mask(dl.Region(dl.Point(BOX[0], BOX[1]),
                                      dl.Point(BOX[2], BOX[3])),
                            largest_component=False).pixels[:, :, 0] > 0
    assert _iou(mine, ref) > 0.9
    disagree = mine != ref
    if disagree.any():
        scale = np.abs(ref_logit).max()
        assert np.abs(ref_logit[disagree]).max() < 0.05 * scale


def test_e2e_host_preprocess_mask_parity(hf, hf_outputs, image):
    """Same seam with the stb-semantics HOST preprocess (reference-exact
    resize, image.cpp:37-51). Catmull-Rom upsampling differs from PIL
    bilinear, so only the mask-level agreement is asserted."""
    env = _make_env(hf[0], "host")
    seg = dl.Segmentation.process(
        dl.ImageView.from_array(image, dl.Channels.rgb), env)
    cands = seg.compute_masks(dl.Point(*POINT))
    for i, cand in enumerate(cands):
        mine = cand.image.pixels[:, :, 0] > 0
        ref_mask = hf_outputs["masks"][i]
        assert _iou(mine, ref_mask) > 0.93, f"candidate {i}"
        ref_logit = hf_outputs["logits"][i]
        disagree = mine != ref_mask
        if disagree.any():
            scale = np.abs(ref_logit).max()
            assert np.abs(ref_logit[disagree]).max() < 0.1 * scale, \
                f"candidate {i}: confident pixels disagree"
