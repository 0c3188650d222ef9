from academicodec_tpu.losses.gan import (
    hinge_adversarial_g_loss,
    hinge_discriminator_loss,
    ls_generator_loss,
    ls_discriminator_loss,
    relative_feature_loss,
    absolute_feature_loss,
    sim_loss,
)
from academicodec_tpu.losses.mel import (
    mel_reconstruction_loss,
    hifigan_mel_losses,
)
