package graft.util

import java.io.File

/** Tiny local-filesystem helpers shared by bench/test plumbing. */
object Dirs {
  def deleteRecursively(f: File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
