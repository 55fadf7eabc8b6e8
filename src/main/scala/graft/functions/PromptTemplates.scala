package graft.functions

/** The reference's SHIPPED prompt assets, vendored byte-identical as
  * classpath resources: the four template variants
  * (/root/reference/lion_linker/prompt/prompt_template_{base,detailed,
  * few_shot,tablellama}.txt, loaded by lion_linker/utils.py:17-23
  * `load_prompt` via importlib.resources) and the few-shot examples file
  * (lion_linker/prompt/examples.txt, read by
  * prompt/generator.py:20-22). A user of the reference gets the same
  * template text from this library without supplying it.
  */
object PromptTemplates {

  val names: Seq[String] = Seq("base", "detailed", "few_shot", "tablellama")

  /** Template text by short name ("base" | "detailed" | "few_shot" |
    * "tablellama") — the reference's `load_prompt(name)`.
    */
  def template(name: String): String = {
    require(names.contains(name), s"unknown prompt template '$name'; have ${names.mkString(",")}")
    graft.util.Fixtures.resourceText(s"graft/prompt/prompt_template_$name.txt")
  }

  /** The reference's few-shot examples payload (examples.txt), the default
    * [EXAMPLES] substitution for the few_shot template.
    */
  lazy val examples: String = graft.util.Fixtures.resourceText("graft/prompt/examples.txt")
}
