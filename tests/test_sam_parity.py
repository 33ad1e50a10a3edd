"""Architecture-parity tests against the independent `transformers` SAM
implementation (random-initialised — no network / checkpoints needed).

This is the rebuild's substitute for the reference's golden-image tests
(SURVEY.md §4): the golden PNGs are git-lfs pointers in this environment, so
instead we prove bit-level architectural equivalence of the prompt encoder,
mask decoder, and ViT image encoder, which together with exact pre/post
processing implies mask parity once real weights are dropped in.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from dlimgedit_tpu.convert.hf_sam import (
    convert_mask_decoder,
    convert_prompt_encoder,
    convert_sam_model,
    convert_vision_encoder,
)
from dlimgedit_tpu.models.mask_decoder import MaskDecoderConfig, predict_masks
from dlimgedit_tpu.models.prompt_encoder import (
    PromptEncoderConfig,
    dense_pe,
    embed_masks,
    embed_points,
)
from dlimgedit_tpu.models.vit_sam import SamViTConfig, sam_vit_apply


@pytest.fixture(scope="module")
def hf_model():
    from transformers import SamConfig, SamModel
    from transformers.models.sam.configuration_sam import (
        SamMaskDecoderConfig,
        SamPromptEncoderConfig,
        SamVisionConfig,
    )

    torch.manual_seed(0)
    cfg = SamConfig(
        vision_config=SamVisionConfig(
            hidden_size=32, output_channels=64, num_hidden_layers=3,
            num_attention_heads=2, image_size=64, patch_size=16,
            window_size=2, global_attn_indexes=[1], num_pos_feats=32,
            attn_implementation="eager",
        ),
        prompt_encoder_config=SamPromptEncoderConfig(
            hidden_size=64, image_size=64, patch_size=16,
            mask_input_channels=8,
        ),
        mask_decoder_config=SamMaskDecoderConfig(
            hidden_size=64, num_attention_heads=2, mlp_dim=128,
            iou_head_hidden_dim=32, layer_norm_eps=1e-5,
        ),
    )
    model = SamModel(cfg)
    model.eval()
    return model, cfg


@pytest.fixture(scope="module")
def my_cfgs(hf_model):
    _, cfg = hf_model
    prompt = PromptEncoderConfig(
        embed_dim=64, image_embedding_size=4, input_image_size=64,
        mask_in_chans=8)
    decoder = MaskDecoderConfig(embed_dim=64, num_heads=2, mlp_dim=128,
                                iou_head_hidden=32)
    vision = SamViTConfig(img_size=64, patch_size=16, embed_dim=32, depth=3,
                          num_heads=2, window_size=2, global_attn_indexes=(1,),
                          neck_dim=64)
    return prompt, decoder, vision


def test_dense_pe_matches(hf_model, my_cfgs):
    model, _ = hf_model
    prompt_cfg, _, _ = my_cfgs
    params = convert_prompt_encoder(model.state_dict())
    with torch.no_grad():
        ref = model.get_image_wide_positional_embeddings()  # (1, C, H, W)
    mine = dense_pe(params, prompt_cfg)  # (H, W, C)
    np.testing.assert_allclose(
        np.asarray(mine).transpose(2, 0, 1), ref[0].detach().numpy(), atol=1e-4)


def test_point_embedding_matches(hf_model, my_cfgs):
    model, _ = hf_model
    prompt_cfg, _, _ = my_cfgs
    params = convert_prompt_encoder(model.state_dict())

    # Point prompt protocol of the reference (segmentation.cpp:146-148):
    # [(p, 1), ((0,0), -1)]. transformers pads an extra (0,0,-1) point
    # pre-shift; label -1 zeroes the PE so coords are irrelevant.
    pts = torch.tensor([[[[13.0, 27.0]]]])
    lbl = torch.tensor([[[1.0]]])
    with torch.no_grad():
        sparse, dense = model.prompt_encoder(
            input_points=pts, input_labels=lbl, input_boxes=None,
            input_masks=None)
    my_pts = jnp.array([[[13.0, 27.0], [-0.5, -0.5]]])
    my_lbl = jnp.array([[1.0, -1.0]])
    mine = embed_points(params, prompt_cfg, my_pts, my_lbl)
    np.testing.assert_allclose(np.asarray(mine[0]), sparse[0, 0].detach().numpy(),
                               atol=1e-4)
    # Dense: no mask input -> no_mask_embed broadcast.
    my_dense = embed_masks(params, prompt_cfg,
                           jnp.zeros((1, 16, 16, 1)), jnp.zeros((1,)))
    np.testing.assert_allclose(
        np.asarray(my_dense[0]).transpose(2, 0, 1), dense[0].detach().numpy(), atol=1e-4)


def test_box_embedding_matches(hf_model, my_cfgs):
    model, _ = hf_model
    prompt_cfg, _, _ = my_cfgs
    params = convert_prompt_encoder(model.state_dict())
    boxes = torch.tensor([[[5.0, 9.0, 40.0, 33.0]]])
    with torch.no_grad():
        sparse, _ = model.prompt_encoder(
            input_points=None, input_labels=None, input_boxes=boxes,
            input_masks=None)
    # Reference protocol (segmentation.cpp:149-152): [(tl, 2), (br, 3)].
    my_pts = jnp.array([[[5.0, 9.0], [40.0, 33.0]]])
    my_lbl = jnp.array([[2.0, 3.0]])
    mine = embed_points(params, prompt_cfg, my_pts, my_lbl)
    np.testing.assert_allclose(np.asarray(mine[0]), sparse[0, 0].detach().numpy(),
                               atol=1e-4)


def test_mask_input_embedding_matches(hf_model, my_cfgs):
    model, _ = hf_model
    prompt_cfg, _, _ = my_cfgs
    params = convert_prompt_encoder(model.state_dict())
    torch.manual_seed(1)
    mask = torch.randn(1, 1, 16, 16)
    with torch.no_grad():
        _, dense = model.prompt_encoder(input_points=None, input_labels=None,
                                        input_boxes=None, input_masks=mask)
    mine = embed_masks(params, prompt_cfg,
                       jnp.array(mask.numpy().transpose(0, 2, 3, 1)),
                       jnp.ones((1,)))
    np.testing.assert_allclose(np.asarray(mine[0]).transpose(2, 0, 1),
                               dense[0].detach().numpy(), atol=1e-4)


def test_mask_decoder_matches(hf_model, my_cfgs):
    model, _ = hf_model
    prompt_cfg, dec_cfg, _ = my_cfgs
    sd = model.state_dict()
    pe_params = convert_prompt_encoder(sd)
    dec_params = convert_mask_decoder(sd)

    torch.manual_seed(2)
    emb = torch.randn(1, 64, 4, 4)  # (B, C, H, W)
    pts = torch.tensor([[[[13.0, 27.0]]]])
    lbl = torch.tensor([[[1.0]]])
    with torch.no_grad():
        sparse, dense = model.prompt_encoder(
            input_points=pts, input_labels=lbl, input_boxes=None,
            input_masks=None)
        image_pe = model.get_image_wide_positional_embeddings()
        ref_masks, ref_iou = model.mask_decoder(
            image_embeddings=emb,
            image_positional_embeddings=image_pe,
            sparse_prompt_embeddings=sparse,
            dense_prompt_embeddings=dense,
            multimask_output=True,
        )

    my_emb = jnp.array(emb.numpy().transpose(0, 2, 3, 1))
    my_sparse = embed_points(pe_params, prompt_cfg,
                             jnp.array([[[13.0, 27.0], [-0.5, -0.5]]]),
                             jnp.array([[1.0, -1.0]]))
    my_dense = embed_masks(pe_params, prompt_cfg, jnp.zeros((1, 16, 16, 1)),
                           jnp.zeros((1,)))
    my_pe = dense_pe(pe_params, prompt_cfg)
    masks, iou = predict_masks(dec_params, my_emb, my_pe, my_sparse, my_dense,
                               dec_cfg)
    # transformers multimask slices tokens 1: ; ours returns all 4.
    np.testing.assert_allclose(np.asarray(masks[0, 1:]),
                               ref_masks[0, 0].detach().numpy(), atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(iou[0, 1:]), ref_iou[0, 0].detach().numpy(),
                               atol=1e-4)


def test_vision_encoder_matches(hf_model, my_cfgs):
    model, _ = hf_model
    _, _, vit_cfg = my_cfgs
    params = convert_vision_encoder(model.state_dict())
    torch.manual_seed(3)
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        ref = model.vision_encoder(x).last_hidden_state  # (B, C, H, W)
    mine = sam_vit_apply(params, jnp.array(x.numpy().transpose(0, 2, 3, 1)),
                         vit_cfg)
    np.testing.assert_allclose(np.asarray(mine[0]).transpose(2, 0, 1),
                               ref[0].detach().numpy(), atol=2e-4, rtol=1e-4)


def test_full_model_conversion(hf_model, my_cfgs):
    model, _ = hf_model
    params = convert_sam_model(model)
    assert set(params.keys()) == {"encoder", "prompt_encoder", "decoder"}
    assert len(params["encoder"]["blocks"]) == 3
    assert len(params["decoder"]["transformer"]["blocks"]) == 2
