package graft.pipeline

/** P7: declarative task DAG with topological wave scheduling — the
  * dependency layer the reference expresses through Prefect's implicit
  * data-flow graph (`parametrized.py`: each task consuming the
  * previous task's return). [[Flow.parallel]] runs one flat wave;
  * real pipelines are DAGs: independent subtrees should run
  * concurrently, dependents must wait, and a cyclic or dangling
  * declaration must fail at SUBMIT time — before any cluster work —
  * not hang at runtime.
  *
  * Scheduling is Kahn layering: `wave(t) = 1 + max(wave(deps))`, each
  * wave's tasks submitted concurrently through [[Flow.parallel]]
  * (inheriting its retry/timeout/cancel-siblings semantics), waves
  * run in order. The wave number is a pure function of the declared
  * edges, so outputs are deterministic regardless of execution
  * interleaving. The driver only orchestrates — each task body
  * submits its own Spark jobs, so the scheduler adds zero data-path
  * overhead at any scale.
  */
object Dag {

  final case class Task[A](name: String, deps: Seq[String], body: () => A)

  final case class Result[A](name: String, wave: Int, value: A)

  /** Validate, layer, and run the DAG; results return in declaration
    * order. Throws `IllegalArgumentException` on duplicate names,
    * unknown dependencies, or cycles — all detected before any task
    * body runs.
    */
  def run[A](tasks: Seq[Task[A]], maxParallel: Int = 8): Seq[Result[A]] = {
    val names = tasks.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate task names: ${names.diff(names.distinct).distinct.mkString(", ")}")
    val byName = tasks.map(t => t.name -> t).toMap
    tasks.foreach(t => t.deps.foreach(d =>
      require(byName.contains(d), s"task '${t.name}' depends on unknown task '$d'")))

    // Kahn layering; a fixpoint that stalls before assigning every
    // task means the unassigned remainder is cyclic
    val wave = scala.collection.mutable.Map.empty[String, Int]
    var changed = true
    while (changed && wave.size < tasks.size) {
      changed = false
      tasks.filterNot(t => wave.contains(t.name)).foreach { t =>
        if (t.deps.forall(wave.contains)) {
          wave(t.name) = 1 + t.deps.map(wave).foldLeft(0)(math.max)
          changed = true
        }
      }
    }
    require(wave.size == tasks.size,
      s"cycle among tasks: ${tasks.map(_.name).filterNot(wave.contains).mkString(", ")}")

    val out = scala.collection.mutable.Map.empty[String, A]
    wave.values.toSeq.distinct.sorted.foreach { w =>
      val batch = tasks.filter(t => wave(t.name) == w)
      val results = Flow.parallel[A](
        batch.map(t => (t.name, t.body)), maxConcurrency = maxParallel)
      batch.zip(results).foreach { case (t, r) => out(t.name) = r }
    }
    tasks.map(t => Result(t.name, wave(t.name), out(t.name)))
  }
}
