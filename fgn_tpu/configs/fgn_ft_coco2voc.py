# Finetune stage (reference fgn_ft.py): COCO-train base Select (3K per
# base cat) merged with VOC-trainval novel Select (K per novel cat);
# eval on VOC-trainval novel FT=Use.
_base_ = ["fgn_r50_c4_densecl.py", "fgn_ft_schedule.py"]

ft_ds_cfg0 = dict(
    n_ways=3,
    k_shots=3,
    ds_base_="COCO",
    ds_base__subset="train",
    ds_novel="VOC",
    ds_novel_subset="trainval",
    sampling_origin_ds="COCO",
    sampling_origin_ds_subset="train",
    sampling_cats="base_",
    sampling_scenario="parents",
    repeats=10,
    shuffle=True,
    qry_cats_choice_random=True,
    spp_random=True,
    finetune="Select",
    spp_fill_ratio=0.8,
    batch=4,
)

ft_ds_cfg1 = dict(
    ft_ds_cfg0,
    sampling_origin_ds="VOC",
    sampling_origin_ds_subset="trainval",
    sampling_cats="novel",
    repeats=1,
    batch=1,
)

eval_ds_cfg0 = dict(
    ft_ds_cfg1,
    finetune="Use",
    shuffle=False,
    augment_qry=False,
    augment_spp=False,
    batch=4,
)

work_dir = "runs/coco2voc_ft"
batch_size = 4
eval_batch_size = 4
max_gt = 30
# Stage-1 checkpoint directory to initialize from.
init_from = "runs/coco2voc_dcl"

# COCO-scale anchor budget (see fgn_train_coco2voc.py).
model = dict(rpn_train_nms_pre=12288, rpn_test_nms_pre=6144)
