from asr_shap.cli import main

main()
